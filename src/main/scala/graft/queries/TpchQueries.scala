package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** General relational benchmark queries over the TPC-H-ish driver tables.
  * The reference has no multi-table analytics, but these exercise (and
  * bench) the engine's generic scan/filter/agg/join paths at sf0.1:
  * hash aggregation with partial (map-side) combine, broadcast hash joins
  * for the small dimensions, and shuffle joins for fact-fact.
  *
  * Large-magnitude revenue sums are rounded to 2 decimals (double partial
  * sums are order-dependent across engines); averages to 6.
  */
object TpchQueries {

  val defs: Map[String, QueryDef] = Map(

    // Q1-style pricing summary: single scan, 4-group hash agg — the
    // whole-stage-codegen hot loop the engine must keep tight.
    "q1_pricing_summary" -> QueryDef(
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate").cast("date") <= lit(java.sql.Date.valueOf("2001-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // Q3-style: small filtered dim (customer) broadcast into orders, then
    // join to the lineitem fact; revenue per order.
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
        li.join(broadcast(ord.join(broadcast(cust),
              col("o_custkey") === col("c_custkey"), "inner")),
            col("l_orderkey") === col("o_orderkey"), "inner")
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      },
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |  AND CAST(l_shipdate AS DATE) > DATE '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin),

    // Q5-style: full dimension chain region→nation→customer→orders→lineitem
    // — every dim broadcast, one shuffle for the final agg.
    "q5_nation_revenue" -> QueryDef(
      (s, dir) => {
        val n = Tables.nation(s, dir)
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate").cast("date") >= lit(java.sql.Date.valueOf("1996-01-01")) &&
            col("o_orderdate").cast("date") < lit(java.sql.Date.valueOf("1999-01-01")))
        val li = Tables.lineitem(s, dir)
        li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem, orders, customer, nation
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND c_nationkey = n_nationkey
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1999-01-01'
        |GROUP BY n_name""".stripMargin)
  )
}
