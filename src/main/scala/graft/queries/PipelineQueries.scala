package graft.queries

import graft.{Pipeline, Tables}

/** E2/E3 registration: the full train-stage pipeline as ONE logical plan —
  * hygiene → all-null-group drop → chronological split → lag + fill
  * features → decimal-exact A6 metrics → model-routing join — verified
  * end-to-end against an independent DuckDB implementation of the whole
  * chain. This is the engine's flagship query (SparkEntry.entry).
  */
object PipelineQueries {

  val defs: Map[String, QueryDef] = Map(

    "pipeline_e2e" -> QueryDef(
      (s, dir) => Pipeline.run(s, Tables.events(s, dir)).trainMetrics,
      """WITH base AS (
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
        |  FROM f1),
        |p AS (
        |  SELECT user_id, event_type, actual, pred_f,
        |    CAST(actual AS DECIMAL(17,6)) AS a,
        |    CAST(pred_f AS DECIMAL(17,6)) AS pf
        |  FROM f2 WHERE split = 'train'),
        |g AS (
        |  SELECT user_id, event_type, count(*) AS n,
        |    CAST(sum((a - pf) * (a - pf)) AS DOUBLE) AS ss_res,
        |    CAST(sum(a * a) AS DOUBLE) AS sum_a2,
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
        |FROM m LEFT JOIN mt USING (user_id, event_type)""".stripMargin)
  )
}
