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
