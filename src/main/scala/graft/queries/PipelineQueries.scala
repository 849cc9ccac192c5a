package graft.queries

import graft.{Pipeline, Tables}

/** E2/E3 registration: the full train-stage pipeline as ONE logical plan —
  * hygiene → all-null-group drop → chronological split → lag + fill
  * features → decimal-exact A6 metrics → model-routing join — verified
  * end-to-end against an independent DuckDB implementation of the whole
  * chain. This is the engine's flagship query (SparkEntry.entry).
  *
  * `pipeline_validate` extends the oracle past the train metrics into the
  * validate stage, pinning the reference's per-feature norm-param reuse
  * asymmetry (validate.py:268-287): 'actual' reuses the persisted TRAIN
  * (mn, rng) — train.py:474-477 persists params for no other feature —
  * while the lag feature always normalizes against local val-split
  * min/max.
  */
object PipelineQueries {

  /** Shared DuckDB CTE chain `base → valid → kept → spl → mt → f1 → f2`:
    * hygiene, all-null-group drop, 70/15/15 row-positional split, model
    * routing, lag-1 predictor, train-order forward fill. One source of
    * truth for every pipeline oracle. */
  private val duckF2Ctes =
    """base AS (
      |  SELECT event_id, ts, user_id, event_type, value AS actual
      |  FROM events WHERE ts IS NOT NULL),
      |valid AS (
      |  SELECT user_id, event_type FROM base
      |  GROUP BY user_id, event_type HAVING count(actual) > 0),
      |kept AS (
      |  SELECT b.* FROM base b JOIN valid USING (user_id, event_type)),
      |spl AS (
      |  SELECT event_id,
      |    CASE WHEN rn <= floor(n * 0.7) THEN 'train'
      |         WHEN rn <= floor(n * 0.7) + floor(n * 0.15) THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM (SELECT event_id,
      |          row_number() OVER (ORDER BY ts, event_id) AS rn,
      |          count(*) OVER () AS n
      |        FROM kept)),
      |mt AS (
      |  SELECT user_id, event_type,
      |    CASE WHEN count(*) >= 50 THEN 'rnn' ELSE 'xgb' END AS model_type
      |  FROM kept GROUP BY user_id, event_type),
      |f1 AS (
      |  SELECT k.*, s.split,
      |    lag(actual) OVER (PARTITION BY user_id, event_type
      |                      ORDER BY ts, event_id) AS pred
      |  FROM kept k JOIN spl s USING (event_id)),
      |f2 AS (
      |  SELECT *,
      |    last_value(pred IGNORE NULLS) OVER (
      |      PARTITION BY user_id, event_type ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pred_f
      |  FROM f1)""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    "pipeline_e2e" -> QueryDef(
      (s, dir) => Pipeline.run(s, Tables.events(s, dir)).trainMetrics,
      s"""WITH $duckF2Ctes,
         |p AS (
         |  SELECT user_id, event_type, actual, pred_f,
         |    CAST(actual AS DECIMAL(17,6)) AS a,
         |    CAST(pred_f AS DECIMAL(17,6)) AS pf
         |  FROM f2 WHERE split = 'train'),
         |g AS (
         |  SELECT user_id, event_type, count(*) AS n,
         |    CAST(sum(CAST((a - pf) * (a - pf) AS DECIMAL(38,6))) AS DOUBLE) AS ss_res,
         |    CAST(sum(CAST(a * a AS DECIMAL(38,6))) AS DOUBLE) AS sum_a2,
         |    CAST(sum(a) AS DOUBLE) AS sum_a
         |  FROM p WHERE actual IS NOT NULL AND pred_f IS NOT NULL
         |    AND abs(actual) < 1e11 AND abs(pred_f) < 1e11
         |  GROUP BY user_id, event_type),
         |m AS (
         |  SELECT user_id, event_type,
         |    CASE WHEN sum_a2 - n * (sum_a / n) * (sum_a / n) = 0 THEN -1.0
         |         ELSE 1.0 - ss_res / (sum_a2 - n * (sum_a / n) * (sum_a / n))
         |    END AS R2,
         |    ss_res / n AS MSE,
         |    n AS Samples
         |  FROM g WHERE n >= 2)
         |SELECT m.user_id, m.event_type, m.Samples, m.R2, m.MSE,
         |  coalesce(mt.model_type, 'xgb') AS model_type
         |FROM m LEFT JOIN mt USING (user_id, event_type)""".stripMargin),

    // The TRAINED-predictor pipeline end-to-end: same chain as
    // pipeline_e2e but with Config(predictor = "ar1") — the per-group OLS
    // line is fit on the TRAIN split (x = the ffilled lag, decimal-exact
    // normal equations), applied to every split as round(slope·x +
    // intercept, 2), untrained keys falling back to the naive pred_f —
    // then the A6 metrics grade the result. The oracle re-derives the
    // WHOLE chain (hygiene → split → lag/ffill → fit → apply+fallback →
    // metrics → routing join) independently. Factor casts widen to
    // DECIMAL(19,6) before multiplying: identical values, but DuckDB
    // stores width ≤ 18 in int64 and its scale-6 square overflows past
    // |x| ≈ 3037 (the a15 lesson).
    "pipeline_e2e_ar1" -> QueryDef(
      (s, dir) => Pipeline.run(s, Tables.events(s, dir),
        Pipeline.Config(predictor = "ar1")).trainMetrics,
      s"""WITH $duckF2Ctes,
         |ag AS (
         |  SELECT user_id, event_type, count(*) AS n_fit,
         |    CAST(sum(CAST(pred_f AS DECIMAL(17,6))) AS DOUBLE) AS sx,
         |    CAST(sum(CAST(actual AS DECIMAL(17,6))) AS DOUBLE) AS sy,
         |    CAST(sum(CAST(
         |      CAST(CAST(pred_f AS DECIMAL(17,6)) AS DECIMAL(19,6))
         |      * CAST(CAST(actual AS DECIMAL(17,6)) AS DECIMAL(19,6))
         |      AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
         |    CAST(sum(CAST(
         |      CAST(CAST(pred_f AS DECIMAL(17,6)) AS DECIMAL(19,6))
         |      * CAST(CAST(pred_f AS DECIMAL(17,6)) AS DECIMAL(19,6))
         |      AS DECIMAL(38,6))) AS DOUBLE) AS sxx
         |  FROM f2
         |  WHERE split = 'train' AND pred_f IS NOT NULL AND actual IS NOT NULL
         |    AND abs(pred_f) < 1e11 AND abs(actual) < 1e11
         |  GROUP BY user_id, event_type),
         |am AS (
         |  SELECT user_id, event_type,
         |    CASE WHEN n_fit * sxx - sx * sx = 0 THEN 0.0
         |         ELSE (n_fit * sxy - sx * sy) / (n_fit * sxx - sx * sx)
         |    END AS slope, n_fit, sx, sy
         |  FROM ag),
         |am2 AS (
         |  SELECT user_id, event_type, slope,
         |    (sy - slope * sx) / n_fit AS intercept
         |  FROM am),
         |pr AS (
         |  SELECT f.user_id, f.event_type, f.actual, f.split,
         |    CASE WHEN am2.slope IS NOT NULL
         |         THEN round(am2.slope * f.pred_f + am2.intercept, 2)
         |         ELSE f.pred_f END AS pred_f
         |  FROM f2 f LEFT JOIN am2 USING (user_id, event_type)),
         |p AS (
         |  SELECT user_id, event_type, actual, pred_f,
         |    CAST(actual AS DECIMAL(17,6)) AS a,
         |    CAST(pred_f AS DECIMAL(17,6)) AS pf
         |  FROM pr WHERE split = 'train'),
         |g AS (
         |  SELECT user_id, event_type, count(*) AS n,
         |    CAST(sum(CAST(
         |      CAST(a - pf AS DECIMAL(19,6)) * CAST(a - pf AS DECIMAL(19,6))
         |      AS DECIMAL(38,6))) AS DOUBLE) AS ss_res,
         |    CAST(sum(CAST(
         |      CAST(a AS DECIMAL(19,6)) * CAST(a AS DECIMAL(19,6))
         |      AS DECIMAL(38,6))) AS DOUBLE) AS sum_a2,
         |    CAST(sum(a) AS DOUBLE) AS sum_a
         |  FROM p WHERE actual IS NOT NULL AND pred_f IS NOT NULL
         |    AND abs(actual) < 1e11 AND abs(pred_f) < 1e11
         |  GROUP BY user_id, event_type),
         |m AS (
         |  SELECT user_id, event_type,
         |    CASE WHEN sum_a2 - n * (sum_a / n) * (sum_a / n) = 0 THEN -1.0
         |         ELSE 1.0 - ss_res / (sum_a2 - n * (sum_a / n) * (sum_a / n))
         |    END AS R2,
         |    ss_res / n AS MSE,
         |    n AS Samples
         |  FROM g WHERE n >= 2)
         |SELECT m.user_id, m.event_type, m.Samples, m.R2, m.MSE,
         |  coalesce(mt.model_type, 'xgb') AS model_type
         |FROM m LEFT JOIN mt USING (user_id, event_type)""".stripMargin),

    // The validate-stage normalized feature frame: per row, 'actual'
    // normalized with the REUSED train params (has_train branch; local
    // val-split fallback otherwise), the lag feature with LOCAL val-split
    // params only — the asymmetry is data-visible via the branch columns
    // and the reused_train_params flag. All arithmetic is selections and
    // single IEEE double compositions — bit-equal cross-engine, no sums.
    "pipeline_validate" -> QueryDef(
      (s, dir) => Pipeline.run(s, Tables.events(s, dir)).validateFeatures,
      s"""WITH $duckF2Ctes,
         |va AS (SELECT * FROM f2 WHERE split = 'val'),
         |tp AS (
         |  SELECT user_id, event_type,
         |    coalesce(min(actual), 0.0) AS t_mn,
         |    CASE WHEN max(actual) IS NULL OR max(actual) = min(actual)
         |         THEN 1.0 ELSE max(actual) - min(actual) END AS t_rng,
         |    true AS has_train
         |  FROM f2 WHERE split = 'train' GROUP BY user_id, event_type),
         |j AS (
         |  SELECT va.*, tp.t_mn, tp.t_rng,
         |    coalesce(tp.has_train, false) AS reused_train_params,
         |    min(va.actual) OVER (PARTITION BY va.user_id, va.event_type) AS l_amn,
         |    max(va.actual) OVER (PARTITION BY va.user_id, va.event_type) AS l_amx,
         |    min(va.pred_f) OVER (PARTITION BY va.user_id, va.event_type) AS l_pmn,
         |    max(va.pred_f) OVER (PARTITION BY va.user_id, va.event_type) AS l_pmx
         |  FROM va LEFT JOIN tp USING (user_id, event_type)),
         |g AS (
         |  SELECT *,
         |    CASE WHEN reused_train_params THEN t_mn
         |         ELSE coalesce(l_amn, 0.0) END AS a_mn,
         |    CASE WHEN reused_train_params THEN t_rng
         |         ELSE CASE WHEN l_amx IS NULL OR l_amx = l_amn THEN 1.0
         |                   ELSE l_amx - l_amn END END AS a_rng,
         |    coalesce(l_pmn, 0.0) AS p_mn,
         |    CASE WHEN l_pmx IS NULL OR l_pmx = l_pmn THEN 1.0
         |         ELSE l_pmx - l_pmn END AS p_rng
         |  FROM j)
         |SELECT event_id, actual, pred_f, reused_train_params,
         |  a_mn, a_rng, p_mn, p_rng,
         |  (actual - a_mn) / a_rng AS actual_norm,
         |  (pred_f - p_mn) / p_rng AS pred_norm
         |FROM g""".stripMargin)
  )
}
