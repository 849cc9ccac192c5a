package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.cleaning
import graft.operators.Features

/** Reference-parity operators (SURVEY.md §2) registered over the driver's
  * `events` test table with the FIXTURES.md §B stand-in mapping:
  * `ts`→EventTime, `user_id`→Currency, `event_type`→Event,
  * `value`→Actual_numeric.
  *
  * The "impact" ordinal uses the literal map view→1, click→2, purchase→3
  * (unmatched→0), mirroring the reference's case-sensitive low/medium/high
  * map (train.py:333-334).
  *
  * Determinism for the DuckDB differential oracle: every derived double is
  * `round(_, 6)` (or coarser for large-magnitude sums) in BOTH engines, int
  * outputs are BIGINT in both, timestamps stay TIMESTAMP_NTZ end-to-end.
  */
object CoreQueries {

  private val key = Seq("user_id", "event_type")
  private val impactMap = Map("view" -> 1, "click" -> 2, "purchase" -> 3)
  private val impactSql =
    "CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'purchase' THEN 3 ELSE 0 END"

  val defs: Map[String, QueryDef] = Map(

    // SRC4 — ordered full scan (db_connector.py:168-174: SELECT … ORDER BY Date, Time)
    "src4_ordered_scan" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"), col("props"))
        .orderBy(col("ts"), col("event_id")),
      """SELECT event_id, ts, user_id, event_type, value, props
        |FROM events ORDER BY ts, event_id""".stripMargin),

    // F13+A7 — high-watermark filter (MySQL Data Push Scripts/main.py:161-166):
    // keep only rows newer than a watermark derived from the table max.
    "f13_watermark_filter" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val wm = ev.agg(max(col("ts")).as("wm"))
        ev.join(broadcast(wm),
            col("ts") > col("wm") - expr("INTERVAL 7 DAYS"), "inner")
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
      },
      """SELECT event_id, ts, user_id, event_type, value FROM events
        |WHERE ts > (SELECT max(ts) - INTERVAL 7 DAY FROM events)""".stripMargin),

    // W8 (engine extension — SURVEY §2e notes the reference has NO session
    // windows): per-user sessionization via the BUILT-IN session_window
    // grouping — events merge into one session while consecutive gaps are
    // < 30 min; the window end is last-event + gap. The oracle re-derives
    // the identical sessions from first principles (lag → µs gap ≥ gap
    // threshold → cumulative-sum session ids → per-session agg), with the
    // gap compared on exact BIGINT microseconds — no float boundary. At
    // scale this is ONE shuffle on user_id; Structured Streaming accepts
    // the same expression with a watermark.
    "w8_session_window" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events")),
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN prev IS NULL
        |           OR epoch_us(ts) - epoch_us(prev) >= 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM (SELECT user_id, ts,
        |          lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |        FROM events)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events
        |FROM sess GROUP BY user_id, sid""".stripMargin),

    // W9 (engine extension) — ntile ranking window: equal-frequency
    // quartiles of customers by balance within each market segment, then
    // per-bucket aggregates (the feature-binning shape every training
    // pipeline uses for monotonic-target encoding). The order key carries
    // c_custkey as a unique tiebreak — ntile over a non-total order is
    // nondeterministic on BOTH engines, which is a correctness bug, not a
    // flakiness nuisance. Both engines implement standard SQL ntile
    // (floor-distributed remainder to the leading buckets). One shuffle.
    "w9_ntile_buckets" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        Tables.customer(s, dir)
          .withColumn("bucket", ntile(4).over(w).cast("long"))
          .groupBy(col("c_mktsegment"), col("bucket"))
          .agg(count(lit(1)).as("n_cust"),
            (sum(expr("CAST(round(c_acctbal * 1e6) AS BIGINT)")).cast("double")
              / lit(1e6) / count(lit(1))).as("avg_bal"),
            max(col("c_acctbal")).as("max_bal"))
      },
      """WITH b AS (
        |  SELECT c_mktsegment, c_acctbal,
        |    ntile(4) OVER (PARTITION BY c_mktsegment
        |                   ORDER BY c_acctbal, c_custkey) AS bucket
        |  FROM customer)
        |SELECT c_mktsegment, CAST(bucket AS BIGINT) AS bucket,
        |  count(*) AS n_cust,
        |  CAST(sum(CAST(round(c_acctbal * 1e6) AS BIGINT)) AS DOUBLE)
        |    / 1e6 / count(*) AS avg_bal,
        |  max(c_acctbal) AS max_bal
        |FROM b GROUP BY c_mktsegment, bucket""".stripMargin),

    // W10 (engine extension) — RANGE-frame window: per-user 7-day trailing
    // moving aggregate over event VALUE (the time-based rolling feature
    // every training pipeline derives; every other window on the board is
    // ROWS-framed). The frame is defined on exact BIGINT microseconds —
    // Spark's rangeBetween needs a numeric order column, and epoch
    // micros make the frame boundary engine-identical with no interval
    // arithmetic. Peers (equal timestamps) are included by value in both
    // engines. The mean divides an exact micro-unit sum by the window
    // count — the a8 convention. One shuffle on user_id.
    "w10_range_moving_avg" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"))
          .rangeBetween(-7L * 86400L * 1000000L, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("ts_us", expr("unix_micros(cast(ts AS timestamp))"))
          .withColumn("v_micro",
            expr("CAST(round(coalesce(value, 0) * 1e6) AS BIGINT)"))
          .withColumn("n_7d", count(lit(1)).over(w))
          .withColumn("avg_7d",
            sum(col("v_micro")).over(w).cast("double") / lit(1e6) / col("n_7d"))
          .select(col("event_id"), col("ts"), col("user_id"),
            col("n_7d"), col("avg_7d"))
      },
      """SELECT event_id, ts, user_id,
        |  count(*) OVER w AS n_7d,
        |  CAST(sum(CAST(round(coalesce(value, 0) * 1e6) AS BIGINT)) OVER w
        |       AS DOUBLE) / 1e6 / count(*) OVER w AS avg_7d
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)""".stripMargin),

    // W10 SCALE PATH (round 14) — the same 7-day trailing aggregate via
    // Features.rangeMovingAggBucketed: Spark re-aggregates a sliding
    // RANGE frame for every row (O(n·w) in one task per key — the skew
    // fixture's 500k-row hot key HUNG the plain form outright,
    // BENCH_SF1.md), while the bucketed decomposition (day-partial
    // prefix sums + in-bucket growing frames + one as-of boundary
    // lookup) bounds every task by rows-per-(user, day). Identical
    // results — the SAME oracle SQL as w10, verbatim.
    "w10_range_moving_avg_daily" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("ts_us", expr("unix_micros(cast(ts AS timestamp))"))
          .withColumn("v_micro",
            expr("CAST(round(coalesce(value, 0) * 1e6) AS BIGINT)"))
        Features.rangeMovingAggBucketed(ev, Seq("user_id"), "ts_us",
            "v_micro", windowMicros = 7L * 86400L * 1000000L,
            outCnt = "n_7d", outSum = "__s7")
          .withColumn("avg_7d",
            col("__s7").cast("double") / lit(1e6) / col("n_7d"))
          .select(col("event_id"), col("ts"), col("user_id"),
            col("n_7d"), col("avg_7d"))
      },
      """SELECT event_id, ts, user_id,
        |  count(*) OVER w AS n_7d,
        |  CAST(sum(CAST(round(coalesce(value, 0) * 1e6) AS BIGINT)) OVER w
        |       AS DOUBLE) / 1e6 / count(*) OVER w AS avg_7d
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)""".stripMargin),

    // W11 (engine extension) — the ranking-function family on one
    // window: rank / dense_rank (gap vs no-gap tie semantics),
    // percent_rank ((rank−1)/(n−1)) and cume_dist (peers/n) — the two
    // fractional ranks are integer ratios evaluated identically in IEEE
    // double by both engines, so the full table hash-matches. Ties share
    // ranks (that is the semantics under test), rows stay unique via
    // event_id; NULL values are filtered because ASC null placement is
    // the one defaults-differ trap (Spark NULLS FIRST, DuckDB NULLS
    // LAST). One shuffle on event_type.
    "w11_rank_family" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
        Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .select(col("event_id"), col("event_type"), col("value"),
            rank().over(w).cast("long").as("rnk"),
            dense_rank().over(w).cast("long").as("drnk"),
            percent_rank().over(w).as("prnk"),
            cume_dist().over(w).as("cdist"))
      },
      """SELECT event_id, event_type, value,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  percent_rank() OVER w AS prnk,
        |  cume_dist() OVER w AS cdist
        |FROM events WHERE value IS NOT NULL
        |WINDOW w AS (PARTITION BY event_type ORDER BY value)""".stripMargin),

    // 2f (engine extension — SURVEY §2f notes the reference has NO set
    // operations; the upsert decomposes into union internally, but the
    // set-op SURFACE deserves its own row): churn analysis via EXCEPT —
    // users who purchased before the final window but never again after — and the
    // INTERSECT complement (retained purchasers), exercising
    // EXCEPT/INTERSECT DISTINCT semantics end-to-end. Both are one
    // shuffle each on the distinct key at scale.
    "set_churned_users" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir).where(col("event_type") === "purchase")
        val h1 = ev.where(col("ts") < lit("2024-01-28").cast("timestamp_ntz"))
          .select(col("user_id"))
        val later = ev.where(col("ts") >= lit("2024-01-28").cast("timestamp_ntz"))
          .select(col("user_id"))
        val churned = h1.except(later)
          .withColumn("status", lit("churned"))
        val retained = h1.intersect(later)
          .withColumn("status", lit("retained"))
        churned.unionByName(retained)
      },
      """SELECT user_id, 'churned' AS status FROM (
        |  SELECT user_id FROM events
        |  WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-28'
        |  EXCEPT
        |  SELECT user_id FROM events
        |  WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-28')
        |UNION ALL
        |SELECT user_id, 'retained' AS status FROM (
        |  SELECT user_id FROM events
        |  WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-28'
        |  INTERSECT
        |  SELECT user_id FROM events
        |  WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-28')""".stripMargin),

    // F6+F9+A1+J1 — impact ordinal, date truncation, and per-(dim, day)
    // high-impact count attached to each row (train.py:415-422). The
    // reference's groupBy+left-join is rewritten as a conditional window
    // count: identical output, one shuffle instead of two plus a join.
    "j1_highimpact_count" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("impact",
            cleaning.ordinalEncode(col("event_type"), impactMap).cast("long"))
          .withColumn("event_date", to_date(col("ts")))
        ev.withColumn("high_impact_count",
            Features.highImpactCount(col("impact") === 3, "user_id", col("event_date")))
          .select(col("event_id"), col("user_id"), col("event_date"),
            col("impact"), col("high_impact_count"))
      },
      s"""SELECT event_id, user_id, CAST(ts AS DATE) AS event_date,
         |  CAST($impactSql AS BIGINT) AS impact,
         |  COUNT(*) FILTER (WHERE event_type = 'purchase')
         |    OVER (PARTITION BY user_id, CAST(ts AS DATE)) AS high_impact_count
         |FROM events""".stripMargin),

    // A2+J3 — model routing by per-key sample count (train.py:377-389).
    "a2_model_routing" -> QueryDef(
      (s, dir) => Features.modelRouting(Tables.events(s, dir), key, threshold = 50),
      """SELECT user_id, event_type, count(*) AS total_samples,
        |  CASE WHEN count(*) >= 50 THEN 'rnn' ELSE 'xgb' END AS model_type
        |FROM events GROUP BY user_id, event_type""".stripMargin),

    // W1 — per-key lag-1 (train.py:424-425).
    "w1_lag" -> QueryDef(
      (s, dir) => {
        val w = Features.keyWindow(key, Seq("ts", "event_id"))
        Tables.events(s, dir)
          .withColumn("value_lag1", Features.lag1(col("value"), w))
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"), col("value_lag1"))
      },
      """SELECT event_id, user_id, event_type, value,
        |  lag(value) OVER (PARTITION BY user_id, event_type
        |                   ORDER BY ts, event_id) AS value_lag1
        |FROM events""".stripMargin),

    // W6 — latest row per group via max_by (test.py:95-120), tiebreak on
    // event_id for determinism.
    "w6_latest_per_group" -> QueryDef(
      (s, dir) => Features.latestPerGroup(Tables.events(s, dir),
        key, time = "ts", tiebreak = "event_id", payload = Seq("value")),
      """SELECT user_id, event_type, value, ts FROM (
        |  SELECT user_id, event_type, value, ts,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin),

    // A6 — per-group regression metrics R²/MSE/Samples (train.py:233-269)
    // with the naive lag-1 predictor standing in for the model scores
    // (SURVEY.md §7 step 5). ss_tot==0 → R²=−1; groups with <2 samples skipped.
    // Sums run in DECIMAL(17,6) (order-independent, exact; |x| < 1e11 domain
    // guard) and only the final per-group arithmetic in double, with the
    // identical expression shape in the oracle — bit-equal outputs with no
    // rounding needed (Features.scala regressionMetrics scaladoc).
    "a6_regression_metrics" -> QueryDef(
      (s, dir) => {
        val w = Features.keyWindow(key, Seq("ts", "event_id"))
        val withPred = Tables.events(s, dir)
          .withColumn("pred", Features.lag1(col("value"), w))
        Features.regressionMetrics(withPred, key, col("value"), col("pred"))
          .select(col("user_id"), col("event_type"),
            col("R2"), col("MSE"), col("Samples"))
      },
      s"""WITH ${OracleSql.a6MetricsCtes}
         |SELECT user_id, event_type, R2, MSE, Samples FROM m""".stripMargin),

    // A13 (engine extension) — ROLLUP subtotal hierarchy (SURVEY §2d notes
    // the reference has no grouping sets; Spark provides them natively):
    // per-(type, user-bucket) counts with type-level and grand totals in
    // one pass. Spark's rollup NULL markers align with ANSI/DuckDB's.
    "a13_rollup_counts" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .withColumn("user_bucket", (col("user_id") % 10).cast("long"))
        .rollup(col("event_type"), col("user_bucket"))
        // coalesce + explicit BIGINT on BOTH sides: DuckDB's sum(BIGINT)
        // widens to HUGEINT (→ float64 in the comparer, lossy past 2^53)
        // and an all-null group would null one engine's sum — pin the
        // exact-integer contract instead of trusting engine widening.
        .agg(count(lit(1)).as("n"),
          coalesce(sum(expr("CAST(round(value * 1e6) AS BIGINT)")), lit(0L))
            .as("value_micro"))
        .select(col("event_type"), col("user_bucket"), col("n"),
          col("value_micro")),
      """SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_bucket,
        |  count(*) AS n,
        |  CAST(coalesce(sum(CAST(round(value * 1e6) AS BIGINT)), 0) AS BIGINT)
        |    AS value_micro
        |FROM events
        |GROUP BY ROLLUP (event_type, user_bucket)""".stripMargin),

    // A13b (engine extension) — CUBE + GROUPING(): all four grouping
    // combinations in one pass, with the grouping id distinguishing a
    // real NULL key from a subtotal row (the trap ROLLUP rows dodge by
    // having non-null keys; GROUPING() is the standard disambiguator and
    // both engines implement it). Same exact-integer micro-unit contract
    // as a13.
    "a13b_cube_counts" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .withColumn("user_bucket", (col("user_id") % 10).cast("long"))
        .cube(col("event_type"), col("user_bucket"))
        .agg(count(lit(1)).as("n"),
          coalesce(sum(expr("CAST(round(value * 1e6) AS BIGINT)")), lit(0L))
            .as("value_micro"),
          grouping(col("event_type")).cast("long").as("g_type"),
          grouping(col("user_bucket")).cast("long").as("g_bucket"))
        .select(col("event_type"), col("user_bucket"), col("g_type"),
          col("g_bucket"), col("n"), col("value_micro")),
      """SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_bucket,
        |  CAST(grouping(event_type) AS BIGINT) AS g_type,
        |  CAST(grouping(CAST(user_id % 10 AS BIGINT)) AS BIGINT) AS g_bucket,
        |  count(*) AS n,
        |  CAST(coalesce(sum(CAST(round(value * 1e6) AS BIGINT)), 0) AS BIGINT)
        |    AS value_micro
        |FROM events
        |GROUP BY CUBE (event_type, CAST(user_id % 10 AS BIGINT))""".stripMargin),

    // P3 (engine extension) — PIVOT: per-day event-type counts as columns
    // (the wide-table reshape every dashboard feed wants). Values are
    // declared (no driver-side distinct scan); missing combinations fill
    // 0 to match the oracle's FILTER counts.
    "p3_pivot_counts" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("event_date"))
        .pivot("event_type", Seq("view", "click", "purchase"))
        .count()
        .na.fill(0L, Seq("view", "click", "purchase")),
      """SELECT CAST(ts AS DATE) AS event_date,
        |  count(*) FILTER (WHERE event_type = 'view') AS view,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase
        |FROM events GROUP BY CAST(ts AS DATE)""".stripMargin),

    // P4 (engine extension) — UNPIVOT/melt: the inverse reshape of P3,
    // wide metric columns back to (key, metric, val) long form — the
    // shape feature stores and metric warehouses ingest. All melted
    // values are BIGINT so the single `val` column is type-stable; the
    // oracle re-derives via UNION ALL (the portable UNPIVOT).
    "p4_unpivot" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("user_id")).as("n_users"),
          coalesce(sum(expr("CAST(round(value * 1e6) AS BIGINT)")), lit(0L))
            .as("value_micro"))
        .unpivot(Array(col("event_type")),
          Array(col("n_events"), col("n_users"), col("value_micro")),
          "metric", "val"),
      """WITH w AS (
        |  SELECT event_type, count(*) AS n_events,
        |    count(DISTINCT user_id) AS n_users,
        |    CAST(coalesce(sum(CAST(round(value * 1e6) AS BIGINT)), 0) AS BIGINT)
        |      AS value_micro
        |  FROM events GROUP BY event_type)
        |SELECT event_type, 'n_events' AS metric, n_events AS val FROM w
        |UNION ALL SELECT event_type, 'n_users', n_users FROM w
        |UNION ALL SELECT event_type, 'value_micro', value_micro FROM w""".stripMargin),

    // A20 (engine extension) — z-score anomaly detection, EXACT: flag
    // events beyond 3σ of their event_type's value distribution. The
    // σ comparison is integerized by cross-multiplication — |x−μ| > 3σ
    // ⟺ (n·x−s)² > 9·(n·q−s²) with x in BIGINT micro-units, s=Σx, q=Σx²
    // — evaluated in DECIMAL(38,0) (int128 in DuckDB, exact in Spark), so
    // the flag involves NO floating point and hash-matches bit-for-bit.
    // One groupBy + one broadcast-size join back: the anomaly gate is a
    // scan predicate at scale.
    "a20_zscore_outliers" -> QueryDef(
      (s, dir) => {
        val x = Tables.events(s, dir)
          .filter(col("value").isNotNull)
          .select(col("event_id"), col("event_type"),
            expr("CAST(round(value * 1e6) AS BIGINT)").as("xm"))
          .localCheckpoint(eager = false)
        val g = x.groupBy(col("event_type"))
          .agg(count(lit(1)).cast("decimal(19,0)").as("n"),
            sum(col("xm").cast("decimal(19,0)")).cast("decimal(19,0)").as("sx"),
            sum(col("xm").cast("decimal(19,0)") * col("xm").cast("decimal(19,0)"))
              .cast("decimal(38,0)").as("q"))
        x.join(broadcast(g), "event_type")
          .filter(
            (col("n") * col("xm").cast("decimal(19,0)") - col("sx"))
              * (col("n") * col("xm").cast("decimal(19,0)") - col("sx"))
              > lit(9) * (col("n") * col("q") - col("sx") * col("sx")))
          .select(col("event_id"), col("event_type"), col("xm"))
      },
      """WITH x AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 1e6) AS BIGINT) AS xm
        |  FROM events WHERE value IS NOT NULL),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS DECIMAL(19,0)) AS n,
        |    CAST(sum(CAST(xm AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS sx,
        |    CAST(sum(CAST(xm AS DECIMAL(19,0)) * CAST(xm AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS q
        |  FROM x GROUP BY event_type)
        |SELECT event_id, x.event_type, xm
        |FROM x JOIN g ON x.event_type = g.event_type
        |WHERE (n * CAST(xm AS DECIMAL(19,0)) - sx)
        |    * (n * CAST(xm AS DECIMAL(19,0)) - sx)
        |  > 9 * (n * q - sx * sx)""".stripMargin),

    // A11 (engine extension) — HyperLogLog approximate distinct: the
    // sketch every 100-TB pipeline uses where exact countDistinct's
    // per-key shuffle state is unaffordable. The HLL value itself is
    // engine-internal, so the registered row asserts the invariants:
    // per-type approx within 5% of exact at rsd 0.01 — a 5-sigma band, so
    // a violation genuinely means the sketch broke (at the DEFAULT rsd
    // 0.05 the same 5% band is ONE sigma and a healthy dense-mode sketch
    // would fail it ~1/3 of the time) — and the approx is positive.
    // Exact counts ride along as data so the oracle re-derives them.
    "a11_approx_distinct" -> QueryDef(
      (s, dir) => {
        // Mixing countDistinct with approx_count_distinct in ONE agg makes
        // Catalyst plan an Expand (every input row duplicated per
        // distinct/non-distinct agg group) — this was the 2nd-slowest
        // bench row in round 5. Splitting the two aggregates over a
        // shared lazily-checkpointed projection (the Dedup/q15
        // convention) removes the Expand and scans the rows once; the
        // per-type join is 5 rows.
        val ev = Tables.events(s, dir)
          .select(col("event_type"), col("user_id"))
          .localCheckpoint(eager = false)
        val exact = ev.distinct()
          .groupBy(col("event_type")).agg(count(lit(1)).as("exact_users"))
        val approx = ev.groupBy(col("event_type"))
          .agg(approx_count_distinct(col("user_id"), 0.01).as("approx"))
        exact.join(approx, "event_type")
          .select(col("event_type"), col("exact_users"),
            (abs(col("approx") - col("exact_users")).cast("double") /
              col("exact_users") <= 0.05).as("within_5pct"),
            (col("approx") > 0).as("positive"))
      },
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  TRUE AS within_5pct, TRUE AS positive
        |FROM events GROUP BY event_type""".stripMargin),

    // A12 (engine extension) — quantile sketch: percentile_approx (the
    // single-pass mergeable Greenwald-Khanna shape). The approximate
    // median is pinned between the EXACT 40th and 60th percentile values
    // computed element-exactly (max-below-rank — no interpolation, so no
    // cross-engine float arithmetic anywhere); DuckDB re-derives the same
    // rank bounds.
    "a12_approx_quantiles" -> QueryDef(
      (s, dir) => {
        val e = Tables.events(s, dir).filter(col("value").isNotNull)
        val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
        val ranked = e
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
        val bounds = ranked
          .groupBy(col("event_type"))
          .agg(
            max(when(col("rn") <= greatest(floor(col("n") * 0.4), lit(1)),
              col("value"))).as("p40_floor"),
            max(when(col("rn") <= greatest(floor(col("n") * 0.6), lit(1)),
              col("value"))).as("p60_floor"))
        val approx = e.groupBy(col("event_type"))
          .agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_approx"))
        approx.join(bounds, "event_type")
          .select(col("event_type"),
            (col("p50_approx") >= col("p40_floor") &&
              col("p50_approx") <= col("p60_floor")).as("median_in_band"))
      },
      """SELECT event_type, TRUE AS median_in_band
        |FROM events WHERE value IS NOT NULL GROUP BY event_type""".stripMargin),

    // F15 (engine extension) — tumbling event-time windows in BATCH: the
    // window() table function (Spark) vs time_bucket (DuckDB), epoch-
    // aligned day buckets on the NTZ timestamp — the batch twin of the
    // streaming windowed aggregation the streaming suite pins, made
    // data-visible. Micro-unit sums, a13's exact-integer contract.
    "f15_tumbling_window" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          coalesce(sum(expr("CAST(round(value * 1e6) AS BIGINT)")), lit(0L))
            .as("value_micro"))
        .select(col("window.start").as("window_start"),
          col("window.end").as("window_end"),
          col("event_type"), col("n"), col("value_micro")),
      """SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
        |  time_bucket(INTERVAL '1 day', ts) + INTERVAL 1 DAY AS window_end,
        |  event_type, count(*) AS n,
        |  CAST(coalesce(sum(CAST(round(value * 1e6) AS BIGINT)), 0) AS BIGINT)
        |    AS value_micro
        |FROM events GROUP BY 1, 2, 3""".stripMargin),

    // J9 (engine extension) — null-safe equality join (<=> / IS NOT
    // DISTINCT FROM): NULL keys MATCH each other instead of vanishing —
    // the reconciliation-join semantics plain equi-joins silently drop
    // rows under. The derived key is NULL for one event class, so the
    // null bucket is genuinely exercised.
    "j9_null_safe_join" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("k", expr("nullif(event_type, 'view')"))
        val a = ev.groupBy(col("k")).agg(count(lit(1)).as("n_all"))
        val b = ev.filter(col("value").isNotNull)
          .groupBy(col("k")).agg(count(lit(1)).as("n_valued"))
        a.join(b, a("k") <=> b("k"))
          .select(a("k").as("k"), col("n_all"), col("n_valued"))
      },
      """WITH e AS (
        |  SELECT nullif(event_type, 'view') AS k, value FROM events),
        |a AS (SELECT k, count(*) AS n_all FROM e GROUP BY k),
        |b AS (SELECT k, count(*) AS n_valued FROM e
        |      WHERE value IS NOT NULL GROUP BY k)
        |SELECT a.k, a.n_all, b.n_valued
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k""".stripMargin),

    // A18 (engine extension) — EXACT median, fully hash-paired (a12 pins
    // only a band): the k-th-smallest formulation on BIGINT micro-units.
    // lo = (n+1) DIV 2, hi = (n+2) DIV 2 pick the middle element(s) by
    // row_number — the value AT a rank is deterministic under ties even
    // though tie order isn't — and the median is (v_lo + v_hi)/2.0, a
    // dyadic halving of an exact integer sum, so both engines agree
    // bitwise with zero interpolation arithmetic. This is the exact
    // path (per-group sort); a12's mergeable sketch is the 100-TB one.
    "a18_exact_median" -> QueryDef(
      (s, dir) => {
        val e = Tables.events(s, dir).filter(col("value").isNotNull)
          .withColumn("v_micro",
            expr("CAST(round(value * 1e6) AS BIGINT)"))
        val ranked = e
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("event_type")).orderBy(col("v_micro"))))
          .withColumn("n",
            count(lit(1)).over(Window.partitionBy(col("event_type"))))
        ranked.groupBy(col("event_type"))
          .agg(
            max(col("n")).as("n"),
            max(when(col("rn") === expr("(n + 1) DIV 2"), col("v_micro")))
              .as("m_lo"),
            max(when(col("rn") === expr("(n + 2) DIV 2"), col("v_micro")))
              .as("m_hi"))
          .withColumn("median",
            (col("m_lo") + col("m_hi")).cast("double") / lit(2.0) / lit(1e6))
          .select(col("event_type"), col("n"), col("m_lo"), col("m_hi"),
            col("median"))
      },
      """WITH v AS (
        |  SELECT event_type, CAST(round(value * 1e6) AS BIGINT) AS v_micro
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type, v_micro,
        |    row_number() OVER (PARTITION BY event_type ORDER BY v_micro) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM v)
        |SELECT event_type, max(n) AS n,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN v_micro END) AS m_lo,
        |  max(CASE WHEN rn = (n + 2) // 2 THEN v_micro END) AS m_hi,
        |  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN v_micro END)
        |     + max(CASE WHEN rn = (n + 2) // 2 THEN v_micro END) AS DOUBLE)
        |    / 2.0 / 1e6 AS median
        |FROM r GROUP BY event_type""".stripMargin),

    // F-json — scalar JSON extraction over events.props (extension surface,
    // SURVEY.md §2g): per-event-type mean of props.k.
    // ONE from_json parse per row (not get_json_object, which re-walks the
    // JSON text per extracted path); PERMISSIVE mode + try_cast keep junk
    // values NULL instead of throwing under Spark 4 ANSI (ADVICE r01).
    "json_props_extract" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .withColumn("k", expr("TRY_CAST(from_json(props, 'k STRING').k AS BIGINT)"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_k"), round(avg(col("k")), 6).as("avg_k")),
      """SELECT event_type, count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
        |  round(avg(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
        |FROM events GROUP BY event_type""".stripMargin),

    // A26 (ext, round 9) — robust median/MAD outlier flagging, the
    // skew-immune sibling of a20's mean/std z-score. Both medians ride
    // the a18 k-th-smallest BIGINT-micro-unit formulation (med2 = 2·med,
    // mad4 = 4·MAD — the doubled units keep even-count halving integer),
    // so every compared quantity is an exact integer rendered to double
    // and the engines agree bitwise. k = 3 of the normal-consistent
    // 1.4826·MAD. Scale notes in Features.madOutliers.
    "a26_mad_outliers" -> QueryDef(
      (s, dir) => {
        graft.operators.Features.madOutliers(Tables.events(s, dir),
          Seq("event_type"), col("value"), k = 3.0)
          .select(col("event_id"), col("event_type"), col("value"),
            col("median"), col("mad"), col("is_outlier"))
      },
      """WITH v AS (
        |  SELECT event_id, event_type, value,
        |    CAST(round(value * 1e6) AS BIGINT) AS vm
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type ORDER BY vm) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM v),
        |med AS (
        |  SELECT event_type,
        |    max(CASE WHEN rn = (n + 1) // 2 THEN vm END)
        |      + max(CASE WHEN rn = (n + 2) // 2 THEN vm END) AS med2
        |  FROM r GROUP BY 1),
        |d AS (
        |  SELECT v.event_id, v.event_type, v.value, v.vm, med.med2,
        |    abs(v.vm * 2 - med.med2) AS dev2
        |  FROM v JOIN med USING (event_type)),
        |dr AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type ORDER BY dev2) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM d),
        |mad AS (
        |  SELECT event_type,
        |    max(CASE WHEN rn = (n + 1) // 2 THEN dev2 END)
        |      + max(CASE WHEN rn = (n + 2) // 2 THEN dev2 END) AS mad4
        |  FROM dr GROUP BY 1)
        |SELECT d.event_id, d.event_type, d.value,
        |  CAST(d.med2 AS DOUBLE) / 2e6 AS median,
        |  CAST(mad.mad4 AS DOUBLE) / 4e6 AS mad,
        |  CAST(d.dev2 AS DOUBLE) / 2e6 >
        |    3.0 * 1.4826 * (CAST(mad.mad4 AS DOUBLE) / 4e6) AS is_outlier
        |FROM d JOIN mad USING (event_type)""".stripMargin)
  )
}
