package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, BloomPrune, FuzzyJoin, RangeJoin}

/** Time-series join operators (engine extensions — SURVEY §2c covers the
  * reference's five equi-join shapes; these are the two non-equi joins a
  * time-series/attribution workload needs that neither the reference nor
  * Spark has as a primitive).
  *
  * The DuckDB oracles use DuckDB's OWN independent implementations —
  * `ASOF LEFT JOIN` for the as-of rows, a plain inequality join for the
  * range row — so the differential check crosses genuinely different
  * algorithms (merge-as-of window vs DuckDB's asof planner; bucketed
  * equi-join vs nested range scan).
  *
  * Determinism: purchases are pre-aggregated to one row per (user_id, ts)
  * (max event_id wins — last-write-wins), because NO engine defines which
  * of several equal-timestamp build rows an as-of join returns; doubles
  * round(_, 6) per the registry convention.
  */
object JoinQueries {

  val defs: Map[String, QueryDef] = Map(

    // As-of BACKWARD (the attribution classic): for every click, the
    // latest same-user purchase at-or-before it. LEFT semantics: clicks
    // with no prior purchase keep NULL purchase columns.
    "asof_attribution" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.where(col("event_type") === "click")
          .select(col("event_id"), col("ts"), col("user_id"),
            round(col("value"), 6).as("click_value"))
        val purchases = ev.where(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts").as("purchase_ts"))
          .agg(max(col("event_id")).as("purchase_id"),
            round(max_by(col("value"), col("event_id")), 6).as("purchase_value"))
        AsOfJoin.backward(clicks, purchases, Seq("user_id"),
          tsColLeft = "ts", tsColRight = "purchase_ts",
          rightPayload = Seq("purchase_id", "purchase_value"))
      },
      """WITH clicks AS (
        |  SELECT event_id, ts, user_id, round(value, 6) AS click_value
        |  FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts AS purchase_ts, max(event_id) AS purchase_id,
        |         round(arg_max(value, event_id), 6) AS purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT c.event_id, c.ts, c.user_id, c.click_value,
        |       p.purchase_ts, p.purchase_id, p.purchase_value
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.purchase_ts""".stripMargin),

    // The SAME attribution semantics through the broadcast scale path
    // (build side collapsed to sorted per-key arrays, probe side map-only,
    // native binary-search match) — one oracle, two independent engine
    // implementations, plus DuckDB's: three algorithms, one answer.
    "asof_attribution_bcast" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.where(col("event_type") === "click")
          .select(col("event_id"), col("ts"), col("user_id"),
            round(col("value"), 6).as("click_value"))
        val purchases = ev.where(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts").as("purchase_ts"))
          .agg(max(col("event_id")).as("purchase_id"),
            round(max_by(col("value"), col("event_id")), 6).as("purchase_value"))
        AsOfJoin.broadcastBackward(clicks, purchases, Seq("user_id"),
          tsColLeft = "ts", tsColRight = "purchase_ts",
          rightPayload = Seq("purchase_id", "purchase_value"))
      },
      """WITH clicks AS (
        |  SELECT event_id, ts, user_id, round(value, 6) AS click_value
        |  FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts AS purchase_ts, max(event_id) AS purchase_id,
        |         round(arg_max(value, event_id), 6) AS purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT c.event_id, c.ts, c.user_id, c.click_value,
        |       p.purchase_ts, p.purchase_id, p.purchase_value
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.purchase_ts""".stripMargin),

    // The SAME attribution semantics through the SIZE-GATED entry point
    // (AsOfJoin.autoBackward): Catalyst's size estimate of the pack
    // columns picks the broadcast path here (the build side is key-
    // cardinality); AsOfJoinSpec pins that an undersized budget flips the
    // same call to the window merge with identical results. This row pins
    // the auto plumbing end-to-end against the shared ASOF oracle.
    "asof_attribution_auto" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.where(col("event_type") === "click")
          .select(col("event_id"), col("ts"), col("user_id"),
            round(col("value"), 6).as("click_value"))
        val purchases = ev.where(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts").as("purchase_ts"))
          .agg(max(col("event_id")).as("purchase_id"),
            round(max_by(col("value"), col("event_id")), 6).as("purchase_value"))
        AsOfJoin.autoBackward(clicks, purchases, Seq("user_id"),
          tsColLeft = "ts", tsColRight = "purchase_ts",
          rightPayload = Seq("purchase_id", "purchase_value"))
      },
      """WITH clicks AS (
        |  SELECT event_id, ts, user_id, round(value, 6) AS click_value
        |  FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts AS purchase_ts, max(event_id) AS purchase_id,
        |         round(arg_max(value, event_id), 6) AS purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT c.event_id, c.ts, c.user_id, c.click_value,
        |       p.purchase_ts, p.purchase_id, p.purchase_value
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.purchase_ts""".stripMargin),

    // As-of FORWARD with tolerance: for every purchase, the next same-user
    // error within 48 hours (time-to-failure analysis). The tolerance
    // NULLs a match that exists but is too far — both engines model
    // "nearest first, then gate" identically.
    "asof_next_error" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("ts"), col("user_id"))
        val errors = ev.where(col("event_type") === "error")
          .select(col("user_id"), col("ts").as("error_ts")).distinct()
        AsOfJoin.forward(purchases, errors, Seq("user_id"),
          tsColLeft = "ts", tsColRight = "error_ts",
          rightPayload = Seq.empty,
          tolerance = Some(expr("INTERVAL 48 HOURS")))
      },
      """SELECT p.event_id, p.ts, p.user_id,
        |       CASE WHEN e.error_ts - p.ts <= INTERVAL 48 HOUR
        |            THEN e.error_ts END AS error_ts
        |FROM (SELECT event_id, ts, user_id FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT DISTINCT user_id, ts AS error_ts FROM events
        |                WHERE event_type = 'error') e
        |  ON p.user_id = e.user_id AND p.ts <= e.error_ts""".stripMargin),

    // The SAME forward semantics through the broadcast scale path (two
    // binary searches: run start, then end of the equal-ts block) — like
    // asof_attribution_bcast, three independent algorithms share one
    // oracle.
    "asof_next_error_bcast" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("ts"), col("user_id"))
        val errors = ev.where(col("event_type") === "error")
          .select(col("user_id"), col("ts").as("error_ts")).distinct()
        AsOfJoin.broadcastForward(purchases, errors, Seq("user_id"),
          tsColLeft = "ts", tsColRight = "error_ts",
          rightPayload = Seq.empty,
          tolerance = Some(expr("INTERVAL 48 HOURS")))
      },
      """SELECT p.event_id, p.ts, p.user_id,
        |       CASE WHEN e.error_ts - p.ts <= INTERVAL 48 HOUR
        |            THEN e.error_ts END AS error_ts
        |FROM (SELECT event_id, ts, user_id FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT DISTINCT user_id, ts AS error_ts FROM events
        |                WHERE event_type = 'error') e
        |  ON p.user_id = e.user_id AND p.ts <= e.error_ts""".stripMargin),

    // Range join: every (click, purchase) pair where the click falls in
    // the purchase's [ts, ts+24h) attribution window, same user. 4-hour
    // bins → each window explodes to ≤ 7 bins; the Spark plan is an
    // equi-join on (user_id, bin), never a nested loop.
    "range_join_attribution" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.where(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
            col("user_id"))
        val windows = ev.where(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("window_start"),
            (col("ts") + expr("INTERVAL 24 HOURS")).as("window_end"))
        RangeJoin.pointInInterval(clicks, windows, Seq("user_id"),
          pointTs = "click_ts", startCol = "window_start",
          endCol = "window_end", binMicros = 4L * 3600 * 1000000)
      },
      """SELECT c.user_id, c.click_id, c.click_ts,
        |       p.purchase_id, p.window_start, p.window_end
        |FROM (SELECT event_id AS click_id, ts AS click_ts, user_id
        |      FROM events WHERE event_type = 'click') c
        |JOIN (SELECT event_id AS purchase_id, user_id, ts AS window_start,
        |             ts + INTERVAL 24 HOUR AS window_end
        |      FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        |     AND c.click_ts >= p.window_start
        |     AND c.click_ts < p.window_end""".stripMargin),

    // J11 (engine extension) — interval-OVERLAP join
    // (RangeJoin.overlapJoin): concurrent activity windows — every
    // (view-session, purchase-session) pair of the same user whose
    // half-open spans intersect. 15-min bins: the Spark plan is an
    // equi-join on (user_id, bin) with the ownership rule deduping
    // exactly-once (no distinct pass); the oracle is DuckDB's plain
    // inequality join.
    "j11_overlap_join" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val views = ev.where(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id"),
            col("ts").as("vs"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("ve"))
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("ps"),
            (col("ts") + expr("INTERVAL 45 MINUTES")).as("pe"))
        RangeJoin.overlapJoin(views, purchases, Seq("user_id"),
          lStart = "vs", lEnd = "ve", rStart = "ps", rEnd = "pe",
          binMicros = 15L * 60 * 1000000)
          .select(col("user_id"), col("view_id"), col("purchase_id"))
      },
      """SELECT v.user_id, v.view_id, p.purchase_id
        |FROM (SELECT event_id AS view_id, user_id, ts AS vs,
        |             ts + INTERVAL 30 MINUTE AS ve
        |      FROM events WHERE event_type = 'view') v
        |JOIN (SELECT event_id AS purchase_id, user_id, ts AS ps,
        |             ts + INTERVAL 45 MINUTE AS pe
        |      FROM events WHERE event_type = 'purchase') p
        |  ON v.user_id = p.user_id AND v.vs < p.pe AND p.ps < v.ve""".stripMargin),

    // J8 (engine extension) — FULL OUTER join: per-user purchase revenue
    // against per-user click counts, keeping users present on EITHER
    // side (the activity-reconciliation shape; every other join on the
    // board is inner/left/semi/anti). The join key resolves through
    // USING-style equi-join on both engines; absent sides surface as
    // explicit has_* flags plus zero-coalesced measures, so the NULL
    // padding itself is under test. Revenue sums in exact BIGINT
    // micro-units (the registry convention). Two shuffles (one per
    // pre-aggregate); the join keys are already co-partitioned.
    "j8_full_outer" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.where(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(sum(expr("CAST(round(coalesce(value, 0) * 1e6) AS BIGINT)"))
            .as("purchase_micros"))
        val clicks = ev.where(col("event_type") === "click")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_clicks"))
        purchases.join(clicks, Seq("user_id"), "full_outer")
          .select(col("user_id"),
            col("purchase_micros").isNotNull.as("has_purchases"),
            col("n_clicks").isNotNull.as("has_clicks"),
            coalesce(col("purchase_micros"), lit(0L)).as("purchase_micros"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
      },
      """WITH p AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(round(coalesce(value, 0) * 1e6) AS BIGINT))
        |         AS BIGINT) AS purchase_micros
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |c AS (
        |  SELECT user_id, count(*) AS n_clicks
        |  FROM events WHERE event_type = 'click' GROUP BY user_id)
        |SELECT coalesce(p.user_id, c.user_id) AS user_id,
        |  p.purchase_micros IS NOT NULL AS has_purchases,
        |  c.n_clicks IS NOT NULL AS has_clicks,
        |  coalesce(p.purchase_micros, 0) AS purchase_micros,
        |  coalesce(c.n_clicks, 0) AS n_clicks
        |FROM p FULL OUTER JOIN c ON p.user_id = c.user_id""".stripMargin),

    // J10 (engine extension) — bloom-pruned semi-join: orders placed by
    // BUILDING-segment customers, with the probe side (orders) pruned
    // MAP-SIDE by a bloom sketch of the build keys before the exact
    // semi-join ([[BloomPrune]] — cuts the probe shuffle to
    // |matches| + fpp·|probe| at scale). The oracle is the plain IN
    // semi-join: the sketch must be result-invisible by construction.
    "j10_bloom_semi" -> QueryDef(
      (s, dir) => {
        val buyers = Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        BloomPrune.semiJoinLong(
          Tables.orders(s, dir), "o_custkey", buyers, "c_custkey",
          expectedItems = 10000L)
          .select(col("o_orderkey"), col("o_custkey"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("price_cents"))
      },
      """SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM orders
        |WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin),

    // Entity resolution (engine extension): every part row probes the
    // 64-entity distinct-name catalog with a corrupted name (leading char
    // dropped — a deterministic stand-in for dirty upstream data both
    // engines derive identically), blocked on the name's last word (which
    // the corruption preserves), verified by thresholded levenshtein ≤ 2,
    // resolved to each probe's best match (min dist, ties to the smaller
    // name). The oracle replicates block-then-verify — the result is
    // defined WITHIN the blocking, the dedup_simhash_pairs convention —
    // with DuckDB's own levenshtein as the independent verifier.
    "er_blocked_match" -> QueryDef(
      (s, dir) => {
        val part = Tables.part(s, dir)
        val cand = FuzzyJoin.blockedLevenshtein(
          probes = part.select(col("p_partkey").as("probe_id"),
            expr("substr(p_name, 2)").as("q_name")),
          catalog = part.select(col("p_name").as("entity_name")).distinct(),
          probeText = col("q_name"), catalogText = col("entity_name"),
          probeBlock = element_at(split(col("q_name"), " "), -1),
          catalogBlock = element_at(split(col("entity_name"), " "), -1),
          maxDist = 2)
        FuzzyJoin.bestMatch(cand, Seq("probe_id"), Seq(col("entity_name")))
          .select(col("probe_id"), col("entity_name").as("matched_name"),
            col("dist").cast("long").as("dist"))
      },
      """WITH probes AS (
        |  SELECT p_partkey AS probe_id, substr(p_name, 2) AS q_name
        |  FROM part),
        |catalog AS (SELECT DISTINCT p_name AS entity_name FROM part),
        |cand AS (
        |  SELECT probe_id, entity_name,
        |    CAST(levenshtein(q_name, entity_name) AS BIGINT) AS dist
        |  FROM probes p JOIN catalog c
        |    ON string_split(p.q_name, ' ')[-1] = string_split(c.entity_name, ' ')[-1]
        |  WHERE levenshtein(q_name, entity_name) <= 2)
        |SELECT probe_id, entity_name AS matched_name, dist
        |FROM cand
        |QUALIFY row_number() OVER (
        |  PARTITION BY probe_id ORDER BY dist, entity_name) = 1""".stripMargin))
}
