package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** General relational benchmark queries over the TPC-H-ish driver tables.
  * The reference has no multi-table analytics, but these exercise (and
  * bench) the engine's generic scan/filter/agg/join paths at sf0.1:
  * hash aggregation with partial (map-side) combine, broadcast hash joins
  * for the small dimensions, and shuffle joins for fact-fact.
  *
  * Determinism vs the DuckDB oracle: every revenue/quantity sum is cast to
  * DECIMAL before aggregation (exact, order-independent under any partial
  * aggregation plan) and back to DOUBLE only after the sum; averages are
  * decimal-sum ÷ count with the same expression shape in both engines, so
  * outputs are bit-identical with no round() needed.
  *
  * Scale notes (100 TB): broadcast hints ONLY on true dimension tables
  * (customer/nation — bounded versus the facts); anything derived from
  * `orders`/`lineitem` joins via shuffle hash / sort-merge on the join key,
  * chosen by AQE at runtime. A forced broadcast of a barely-filtered fact
  * (round 1) OOMs the driver at 100× data.
  */
object TpchQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")

  val defs: Map[String, QueryDef] = Map(

    // Q1-style pricing summary: single scan, 4-group hash agg — the
    // whole-stage-codegen hot loop the engine must keep tight.
    "q1_pricing_summary" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate").cast("date") <= lit(java.sql.Date.valueOf("2001-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // Q3-style: filtered dim (customer) broadcast into orders, the result
    // shuffle-joined to lineitem on the order key (orders is barely filtered
    // — never broadcast it); revenue per order in exact decimal.
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
          .agg(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .cast("double").as("revenue"))
      },
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |  AND CAST(l_shipdate AS DATE) > DATE '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin),

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
          .agg(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .cast("double").as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem, orders, customer, nation
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND c_nationkey = n_nationkey
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1999-01-01'
        |GROUP BY n_name""".stripMargin)
  )
}
