package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.Tables

/** General relational benchmark queries over the TPC-H-ish driver tables.
  * The reference has no multi-table analytics, but these exercise (and
  * bench) the engine's generic scan/filter/agg/join paths at sf0.1:
  * hash aggregation with partial (map-side) combine, broadcast hash joins
  * for the small dimensions, and shuffle joins for fact-fact.
  *
  * Determinism vs the DuckDB oracle: every sum is snapped to BIGINT
  * micro-units (`round(x·1e6)`, half-away-from-zero in both engines) and
  * summed exactly as integers — double→DECIMAL casts are NOT portable
  * near scale ties (DuckDB converts via shortest-repr, the JVM via the
  * exact binary expansion; see FeatureQueries a8). The micro-unit sums
  * fit int64 comfortably at bench scale (~6e16 of 9.2e18); an extreme-SF
  * deployment would move the snap to DECIMAL(38,0) sums of the same
  * integers.
  *
  * Scale notes (100 TB): broadcast hints ONLY on true dimension tables
  * (customer/nation — bounded versus the facts); anything derived from
  * `orders`/`lineitem` joins via shuffle hash / sort-merge on the join
  * key, chosen by AQE at runtime. A forced broadcast of a barely-filtered
  * fact (round 1) OOMs the driver at 100×.
  */
object TpchQueries {

  /** Exact order-independent sum of the SQL expression `xSql` in 1e-6
    * units, back to double. */
  private def microSum(xSql: String): Column =
    sum(expr(s"CAST(round(($xSql) * 1e6) AS BIGINT)"))
      .cast("double") / lit(1e6)

  /** The same exact sum kept as BIGINT micro-units — for queries that
    * COMPARE aggregates (max-equality, correlated thresholds), where a
    * double round-trip would reintroduce engine-dependent ties. */
  private def microSumRaw(xSql: String): Column =
    sum(expr(s"CAST(round(($xSql) * 1e6) AS BIGINT)"))

  private val discPrice = "l_extendedprice * (1 - l_discount)"
  private val duckSums =
    """CAST(sum(CAST(round(l_quantity * 1e6) AS BIGINT)) AS DOUBLE) / 1e6"""

  val defs: Map[String, QueryDef] = Map(

    // Q1-style pricing summary: single scan, 4-group hash agg — the
    // whole-stage-codegen hot loop the engine must keep tight.
    "q1_pricing_summary" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate").cast("date") <= lit(java.sql.Date.valueOf("2001-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          microSum("l_quantity").as("sum_qty"),
          microSum("l_extendedprice").as("sum_base_price"),
          microSum(discPrice).as("sum_disc_price"),
          (microSum("l_quantity") / count(lit(1))).as("avg_qty"),
          (microSum("l_discount") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      s"""SELECT l_returnflag, l_linestatus,
         |  $duckSums AS sum_qty,
         |  CAST(sum(CAST(round(l_extendedprice * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_base_price,
         |  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS sum_disc_price,
         |  $duckSums / count(*) AS avg_qty,
         |  CAST(sum(CAST(round(l_discount * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / count(*) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // Q6-style: the pure scan-filter-agg shape — one whole-stage-codegen
    // span, no joins, no wide state; the "how fast can the engine move
    // bytes" floor. All three predicates push down to the parquet scan.
    "q6_forecast_revenue" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate").cast("date") >= lit(java.sql.Date.valueOf("1997-01-01")) &&
          col("l_shipdate").cast("date") < lit(java.sql.Date.valueOf("1998-01-01")) &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(microSum("l_extendedprice * l_discount").as("revenue"),
          count(lit(1)).as("n_lines")),
      """SELECT
        |  CAST(sum(CAST(round((l_extendedprice * l_discount) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin),

    // Q12-style: fact-fact join + conditional aggregation — urgent vs
    // non-urgent order counts per line status (the shipmode query shape
    // adapted to the driver schema).
    "q12_priority_lines" -> QueryDef(
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority"))
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate").cast("date") >= lit(java.sql.Date.valueOf("1997-01-01")))
          .select(col("l_orderkey"), col("l_linestatus"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_linestatus"))
          .agg(
            count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit(1)))
              .as("high_line_count"),
            count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit(1)))
              .as("low_line_count"))
      },
      """SELECT l_linestatus,
        |  count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
        |  count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
        |FROM lineitem, orders
        |WHERE l_orderkey = o_orderkey
        |  AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        |GROUP BY l_linestatus""".stripMargin),

    // Q3-style: filtered dim (customer) broadcast into orders, the result
    // shuffle-joined to lineitem on the order key (orders is barely filtered
    // — never broadcast it); revenue per order in exact micro-units.
    "q3_order_revenue" -> QueryDef(
      (s, dir) => {
        val cust = Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderdate").cast("date") < lit(java.sql.Date.valueOf("1998-01-01")))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
        val li = Tables.lineitem(s, dir)
          .filter(col("l_shipdate").cast("date") > lit(java.sql.Date.valueOf("1997-01-01")))
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        li.join(ord.join(broadcast(cust),
              col("o_custkey") === col("c_custkey"), "inner"),
            col("l_orderkey") === col("o_orderkey"), "inner")
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(microSum(discPrice).as("revenue"))
      },
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |  AND CAST(l_shipdate AS DATE) > DATE '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin),

    // Q4-style: EXISTS decorrelated to a left-semi join WITH a
    // non-equi conjunct (l_shipdate > o_orderdate) — the correlated-
    // subquery shape the reference never exercises. Spark plans the semi
    // join on the equi key with the range conjunct as a join residual;
    // orders is the streamed side, lineitem only contributes existence.
    "q4_order_priority" -> QueryDef(
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate").cast("date") >= lit(java.sql.Date.valueOf("1996-01-01")))
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
        o.join(li,
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > col("o_orderdate"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
      },
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin),

    // Q7-style: five-way join with the nation dimension broadcast TWICE
    // under different roles (supplier's nation vs customer's nation) —
    // revenue per (supp_nation, cust_nation, year). The facts join on
    // their keys via shuffle; all four dimension hops are broadcasts.
    "q7_nation_trade" -> QueryDef(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"), col("l_shipdate"))
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
        val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
        val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
        val n1 = Tables.nation(s, dir)
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, dir)
          .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
          .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(microSum(discPrice).as("revenue"))
      },
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |GROUP BY sn.n_name, cn.n_name, year(l_shipdate)""".stripMargin),

    // Q14-style: conditional-aggregation ratio (promo revenue share per
    // ship month) — two exact micro-unit sums divided in double with the
    // IDENTICAL expression shape in the oracle, so the quotient is
    // bit-equal without rounding.
    "q14_promo_share" -> QueryDef(
      (s, dir) => {
        val promoPrice =
          s"CASE WHEN p_type = 'PROMO' THEN $discPrice ELSE 0.0 END"
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate").cast("date") >= lit(java.sql.Date.valueOf("1997-01-01")) &&
            col("l_shipdate").cast("date") < lit(java.sql.Date.valueOf("1998-01-01")))
          .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_type"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
          .agg(
            (lit(100.0) * microSum(promoPrice) / microSum(discPrice))
              .as("promo_share"),
            count(lit(1)).as("n_lines"))
      },
      """SELECT date_trunc('month', l_shipdate) AS ship_month,
        |  100.0 * (CAST(sum(CAST(round((CASE WHEN p_type = 'PROMO'
        |                 THEN l_extendedprice * (1 - l_discount)
        |                 ELSE 0.0 END) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6)
        |        / (CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6)
        |    AS promo_share,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        |GROUP BY date_trunc('month', l_shipdate)""".stripMargin),

    // Q8-style: market share — the revenue fraction delivered by one
    // supplier nation, per order year, within one REGION's customers.
    // Exercises the region→nation→customer dimension chain (region was
    // otherwise uncovered) plus a conditional-share ratio of two exact
    // micro-sums with the identical expression shape in the oracle.
    "q8_market_share" -> QueryDef(
      (s, dir) => {
        val asiaNations = Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir)
            .filter(col("r_name") === "ASIA")), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))
        val cust = Tables.customer(s, dir)
          .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"))
        val supNation = Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("snk"))
          .select(col("s_suppkey"), col("supp_nation"))
        val targetShare =
          s"CASE WHEN supp_nation = 'NATION_7' THEN $discPrice ELSE 0.0 END"
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
            col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg((microSum(targetShare) / microSum(discPrice)).as("mkt_share"),
            count(lit(1)).as("n_lines"))
      },
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  (CAST(sum(CAST(round((CASE WHEN sn.n_name = 'NATION_7'
        |          THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6)
        |  / (CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6)
        |    AS mkt_share,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |GROUP BY year(o_orderdate)""".stripMargin),

    // Q10-style: returned-item revenue per customer — a selective fact
    // filter (returnflag = 'R'), a fact-fact shuffle join, then the
    // customer/nation dimension hops as broadcasts; high-cardinality
    // grouping on the customer.
    "q10_returned_revenue" -> QueryDef(
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate").cast("date") >= lit(java.sql.Date.valueOf("1997-01-01")) &&
            col("o_orderdate").cast("date") < lit(java.sql.Date.valueOf("1997-07-01")))
          .select(col("o_orderkey"), col("o_custkey"))
        Tables.lineitem(s, dir)
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir).select(col("c_custkey"),
            col("c_name"), col("c_acctbal"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(microSum(discPrice).as("revenue"))
      },
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue
        |FROM lineitem, orders, customer, nation
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
        |  AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-07-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name""".stripMargin),

    // Q13-style: customer order-count distribution — LEFT OUTER join
    // (customers with zero qualifying orders must survive with count 0)
    // into a two-level aggregation. The filter lives in the join, not a
    // WHERE (a WHERE would silently turn the outer join inner).
    "q13_order_distribution" -> QueryDef(
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_orderkey"), col("o_custkey"))
        Tables.customer(s, dir).select(col("c_custkey"))
          .join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
      },
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN (
        |    SELECT o_orderkey, o_custkey FROM orders
        |    WHERE o_orderpriority <> '1-URGENT') o
        |    ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin),

    // Q15-style: top supplier(s) by revenue — an aggregate compared
    // against the aggregate-of-the-aggregate (scalar max subquery). The
    // comparison runs on the exact BIGINT micro-units, never the double
    // round-trip: max-equality on doubles is where cross-engine ties die.
    "q15_top_supplier" -> QueryDef(
      (s, dir) => {
        // LAZY checkpoint (the Dedup convention): the per-supplier revenue
        // feeds BOTH the max subquery and the equality join side — without
        // persistence the lineitem scan + aggregation runs twice.
        val rev = Tables.lineitem(s, dir)
          .filter(col("l_shipdate").cast("date") >= lit(java.sql.Date.valueOf("1997-01-01")))
          .groupBy(col("l_suppkey"))
          .agg(microSumRaw(discPrice).as("rev_micro"))
          .localCheckpoint(eager = false)
        val top = rev.agg(max(col("rev_micro")).as("max_micro"))
        rev.join(broadcast(top), col("rev_micro") === col("max_micro"))
          .join(broadcast(Tables.supplier(s, dir)
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            (col("rev_micro").cast("double") / lit(1e6)).as("total_revenue"))
      },
      """WITH r AS (
        |  SELECT l_suppkey,
        |    sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1e6) AS BIGINT)) AS rev_micro
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_micro AS DOUBLE) / 1e6 AS total_revenue
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_micro = (SELECT max(rev_micro) FROM r)""".stripMargin),

    // Q17-style: correlated average — lines whose quantity is below 20%
    // of their part's average quantity. The per-part average comes back
    // as (count, exact micro-sum) and the threshold test is pure integer
    // arithmetic (q*5n < Σq ⟺ q < 0.2·avg) — no float boundary anywhere.
    // The agg side derives from the fact itself, so it carries no
    // broadcast HINT: AQE broadcasts it at bench scale (observed) and
    // falls back to a shuffle join when part cardinality grows with the
    // fact — the runtime-adaptive choice a static hint would foreclose.
    "q17_small_quantity" -> QueryDef(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        val perPart = li.groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n"), microSumRaw("l_quantity").as("qsum"))
        li.join(broadcast(Tables.part(s, dir)
            .filter(col("p_type") === "SMALL").select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"))
          .join(perPart, "l_partkey")
          .filter(expr("CAST(round(l_quantity * 1e6) AS BIGINT) * 5 * n < qsum"))
          .agg((microSum("l_extendedprice") / lit(7.0)).as("avg_yearly"),
            count(lit(1)).as("n_lines"))
      },
      """WITH pp AS (
        |  SELECT l_partkey, count(*) AS n,
        |    sum(CAST(round(l_quantity * 1e6) AS BIGINT)) AS qsum
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT
        |  CAST(sum(CAST(round(l_extendedprice * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / 7.0 AS avg_yearly,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'SMALL'
        |JOIN pp USING (l_partkey)
        |WHERE CAST(round(l_quantity * 1e6) AS BIGINT) * 5 * n < qsum""".stripMargin),

    // Q18-style: large orders — per-order quantity sum with a HAVING
    // threshold, the surviving keys joined back to orders + customer.
    // The big-order set is fact-derived (shuffle join on the order key);
    // only the customer hop broadcasts.
    "q18_large_orders" -> QueryDef(
      (s, dir) => {
        val big = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(microSumRaw("l_quantity").as("qty_micro"))
          .filter(col("qty_micro") > lit(250L * 1000000L))
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
            col("o_totalprice"))
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(Tables.customer(s, dir)
            .select(col("c_custkey"), col("c_name"))),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"),
            (col("qty_micro").cast("double") / lit(1e6)).as("total_qty"))
      },
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(qty_micro AS DOUBLE) / 1e6 AS total_qty
        |FROM (
        |  SELECT l_orderkey,
        |    sum(CAST(round(l_quantity * 1e6) AS BIGINT)) AS qty_micro
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(round(l_quantity * 1e6) AS BIGINT)) > 250000000) b
        |JOIN orders ON o_orderkey = b.l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin),

    // Q19-style: disjunction of brand/size/quantity conjunctions — the
    // OR-of-ANDs predicate that tests codegen'd predicate evaluation and
    // partial pushdown (the shared l_quantity bounds prune at the scan;
    // the per-brand arms evaluate post-join).
    "q19_disjunctive" -> QueryDef(
      (s, dir) => {
        val arm = (brand: String, qLo: Int, qHi: Int, sHi: Int) =>
          col("p_brand") === brand &&
            col("l_quantity").between(qLo, qHi) &&
            col("p_size").between(1, sHi)
        Tables.lineitem(s, dir)
          .select(col("l_partkey"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"))
          .join(broadcast(Tables.part(s, dir)
            .select(col("p_partkey"), col("p_brand"), col("p_size"))),
            col("l_partkey") === col("p_partkey"))
          .filter(arm("Brand#11", 1, 11, 5) || arm("Brand#15", 10, 20, 10) ||
            arm("Brand#18", 20, 30, 15))
          .agg(microSum(discPrice).as("revenue"), count(lit(1)).as("n_lines"))
      },
      """SELECT
        |  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#11' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
        |   OR (p_brand = 'Brand#15' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#18' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)""".stripMargin),

    // Q22-style: customers above the positive-balance average with no
    // RECENT orders — scalar subquery threshold + ANTI join (the one join
    // type the suite didn't yet exercise). "Recent" (≥ 1998-01-01) rather
    // than TPC-H's "any": this generator gives virtually every customer
    // an order history, so the literal q22 anti-join would verify an
    // always-empty result — a trivially-agreeing check. The average test
    // is exact integer cross-multiplication (bal·n > Σbal), no float
    // boundary; grouped by market segment (the driver schema's stand-in
    // for country code).
    "q22_inactive_customers" -> QueryDef(
      (s, dir) => {
        val cust = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        val posAvg = cust.filter(col("c_acctbal") > 0.0)
          .agg(count(lit(1)).as("np"), microSumRaw("c_acctbal").as("psum"))
        val recent = Tables.orders(s, dir)
          .filter(col("o_orderdate").cast("date") >= lit(java.sql.Date.valueOf("1998-01-01")))
          .select(col("o_custkey"))
        cust.crossJoin(broadcast(posAvg))
          .filter(expr("CAST(round(c_acctbal * 1e6) AS BIGINT) * np > psum"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("numcust"), microSum("c_acctbal").as("totacctbal"))
      },
      """WITH pa AS (
        |  SELECT count(*) AS np,
        |    sum(CAST(round(c_acctbal * 1e6) AS BIGINT)) AS psum
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_mktsegment, count(*) AS numcust,
        |  CAST(sum(CAST(round(c_acctbal * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS totacctbal
        |FROM customer, pa
        |WHERE CAST(round(c_acctbal * 1e6) AS BIGINT) * np > psum
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND CAST(o_orderdate AS DATE) >= DATE '1998-01-01')
        |GROUP BY c_mktsegment""".stripMargin),

    // Q2-style: min-cost supplier per part — the argmin-per-group shape
    // (aggregate compared to the aggregate-of-the-aggregate, q15's scalar
    // max generalized to one max PER GROUP). No partsupp table in this
    // schema, so "cost" is the cheapest observed line price per
    // (part, supplier) over the lineitem bridge, EUROPE suppliers only.
    // The equality runs on exact BIGINT micro-units — double argmin ties
    // are where cross-engine determinism dies — and ALL tied suppliers
    // survive, as in real q2.
    "q2_min_cost_supplier" -> QueryDef(
      (s, dir) => {
        val euroSupp = Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)
            .join(broadcast(Tables.region(s, dir)
              .filter(col("r_name") === "EUROPE")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"))
        // LAZY checkpoint (the q15 convention): the per-(part,supplier)
        // cost feeds BOTH the per-part min and the equality join side.
        val cost = Tables.lineitem(s, dir)
          .join(broadcast(euroSupp.select(col("s_suppkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(expr("CAST(round(l_extendedprice * 1e6) AS BIGINT)")).as("c"))
          .localCheckpoint(eager = false)
        val mc = cost.groupBy(col("l_partkey")).agg(min(col("c")).as("mn"))
        cost.join(mc.withColumnRenamed("l_partkey", "mc_partkey"),
            col("l_partkey") === col("mc_partkey") && col("c") === col("mn"))
          .join(broadcast(Tables.part(s, dir)
            .filter(col("p_size") <= 5).select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(euroSupp), col("l_suppkey") === col("s_suppkey"))
          .select(col("p_partkey"), col("s_name"),
            (col("c").cast("double") / lit(1e6)).as("min_cost"))
      },
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(round(l_extendedprice * 1e6) AS BIGINT)) AS c
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  GROUP BY l_partkey, l_suppkey),
        |mc AS (SELECT l_partkey, min(c) AS mn FROM cost GROUP BY l_partkey)
        |SELECT p_partkey, s_name, CAST(c AS DOUBLE) / 1e6 AS min_cost
        |FROM cost JOIN mc ON cost.l_partkey = mc.l_partkey AND c = mn
        |JOIN part ON cost.l_partkey = p_partkey AND p_size <= 5
        |JOIN supplier ON l_suppkey = s_suppkey""".stripMargin),

    // Q9-style: product-type profit per (supplier nation, order year).
    // No partsupp cost column here, so profit = disc price − 0.5·retail·qty
    // snapped to micro-units PER ROW (one snap, one exact sum — the same
    // discipline as every other revenue query). Exercises the LIKE-filtered
    // part broadcast + four-table join into a two-key agg.
    "q9_nation_profit" -> QueryDef(
      (s, dir) => {
        val profit =
          "l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity"
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.part(s, dir)
            .filter(col("p_name").contains("a"))
            .select(col("p_partkey"), col("p_retailprice"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(Tables.supplier(s, dir)
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"),
            year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(microSum(profit).as("profit"))
      },
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)
        |    - 0.5 * p_retailprice * l_quantity) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
        |    AS profit
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%a%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name, year(o_orderdate)""".stripMargin),

    // Q11-style: important parts — per-part value for ONE nation's
    // suppliers, kept only when the part exceeds 1/1000 of that nation's
    // total (the global-share HAVING). The share gate cross-multiplies
    // exact BIGINT micro-units (val·1000 > total) — headroom to ~9.2e15
    // micro (~9.2e9 price units) per nation before int64 overflow; an
    // extreme-SF deployment moves the same integers to DECIMAL(38,0).
    "q11_important_parts" -> QueryDef(
      (s, dir) => {
        val natSupp = Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)
            .filter(col("n_name") === "NATION_5")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"))
        // LAZY checkpoint: per-part values feed the total AND the gate.
        val v = Tables.lineitem(s, dir)
          .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_partkey"))
          .agg(microSumRaw(discPrice).as("val_micro"))
          .localCheckpoint(eager = false)
        val tot = v.agg(sum(col("val_micro")).as("total_micro"))
        v.crossJoin(broadcast(tot))
          .filter(col("val_micro") * 1000 > col("total_micro"))
          .select(col("l_partkey"),
            (col("val_micro").cast("double") / lit(1e6)).as("value"))
      },
      """WITH v AS (
        |  SELECT l_partkey,
        |    sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1e6) AS BIGINT)) AS val_micro
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_5'
        |  GROUP BY l_partkey)
        |SELECT l_partkey, CAST(val_micro AS DOUBLE) / 1e6 AS value
        |FROM v WHERE val_micro * 1000 > (SELECT sum(val_micro) FROM v)""".stripMargin),

    // Q16-style: supplier diversity per (brand, type) for small parts,
    // EXCLUDING flagged suppliers (negative balance — the "complaints"
    // stand-in) — NOT IN decorrelated to a broadcast ANTI join feeding a
    // count-DISTINCT aggregation (two-phase: distinct then count).
    "q16_supplier_count" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(Tables.part(s, dir)
          .filter(col("p_size") <= 10)
          .select(col("p_partkey"), col("p_brand"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, dir)
          .filter(col("s_acctbal") < 0).select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt")),
      """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 10
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type""".stripMargin),

    // Q20-style: high-volume suppliers — suppliers who moved more than 80
    // units of some PROMO part (the availqty>half-of-ordered stand-in:
    // a HAVING-gated per-(supplier,part) aggregate), restricted to ASIA.
    // The qualifying-supplier set is fact-derived, so the semi join
    // carries no broadcast hint (q17's stance: AQE broadcasts it at bench
    // scale, falls back to shuffle when it grows with the fact).
    "q20_volume_suppliers" -> QueryDef(
      (s, dir) => {
        val hv = Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)
            .filter(col("p_type") === "PROMO").select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(microSumRaw("l_quantity").as("q_micro"))
          .filter(col("q_micro") > lit(80L * 1000000L))
          .select(col("l_suppkey"))
        Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)
            .join(broadcast(Tables.region(s, dir)
              .filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"))),
            col("s_nationkey") === col("n_nationkey"))
          .join(hv, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_name"), col("s_acctbal"))
      },
      """WITH hv AS (
        |  SELECT l_suppkey FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(CAST(round(l_quantity * 1e6) AS BIGINT)) > 80000000)
        |SELECT s_name, s_acctbal FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |WHERE s_suppkey IN (SELECT l_suppkey FROM hv)""".stripMargin),

    // Q21-style: suppliers who kept orders waiting — the double-correlated
    // shape (EXISTS another supplier in the same order, NOT EXISTS another
    // LATE supplier), decorrelated to a semi join + an ANTI SELF-join on
    // the late set. No commit/receipt dates in this schema, so "late" =
    // shipped more than 90 days after the order date, 'F'-status orders.
    // late/allp both derive from the same fact⋈orders frame — one LAZY
    // checkpoint each, so the scan+join runs once per set, not per
    // consumer.
    "q21_waiting_suppliers" -> QueryDef(
      (s, dir) => {
        val lo = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
          .join(Tables.orders(s, dir)
            .filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
        val allp = lo.select(col("l_orderkey").as("a_ok"), col("l_suppkey").as("a_sk"))
          .distinct().localCheckpoint(eager = false)
        val late = lo
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .select(col("l_orderkey"), col("l_suppkey"))
          .distinct().localCheckpoint(eager = false)
        late
          .join(allp, col("l_orderkey") === col("a_ok") &&
            col("l_suppkey") =!= col("a_sk"), "left_semi")
          .join(late.select(col("l_orderkey").as("x_ok"), col("l_suppkey").as("x_sk")),
            col("l_orderkey") === col("x_ok") &&
              col("l_suppkey") =!= col("x_sk"), "left_anti")
          .join(broadcast(Tables.supplier(s, dir)
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
      },
      """WITH lo AS (
        |  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lo
        |         WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY),
        |allp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lo)
        |SELECT s_name, count(*) AS numwait
        |FROM late l JOIN supplier ON l.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM allp a
        |              WHERE a.l_orderkey = l.l_orderkey AND a.l_suppkey <> l.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late x
        |              WHERE x.l_orderkey = l.l_orderkey AND x.l_suppkey <> l.l_suppkey)
        |GROUP BY s_name""".stripMargin),

    // Q5-style: dimension chain nation→customer broadcast, lineitem⋈orders
    // as a shuffle join on the order key (AQE picks the physical strategy),
    // one final shuffle for the 25-group agg.
    "q5_nation_revenue" -> QueryDef(
      (s, dir) => {
        val n = Tables.nation(s, dir)
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate").cast("date") >= lit(java.sql.Date.valueOf("1996-01-01")) &&
            col("o_orderdate").cast("date") < lit(java.sql.Date.valueOf("1999-01-01")))
        val li = Tables.lineitem(s, dir)
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(microSum(discPrice).as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      """SELECT n_name,
        |  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem, orders, customer, nation
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND c_nationkey = n_nationkey
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1999-01-01'
        |GROUP BY n_name""".stripMargin)
  )
}
