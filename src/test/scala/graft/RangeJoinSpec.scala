package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** RangeJoin.pointInInterval semantics (boundary inclusivity, exactly-once
  * matching across bins, degenerate intervals), a keyed differential vs
  * the naive inequality join on real events, and the plan contract: the
  * UNKEYED bucketed range join stays an equi-join while the naive control
  * collapses to BroadcastNestedLoopJoin — the difference that makes the
  * operator viable at scale. Values are also oracle-checked end-to-end by
  * range_join_attribution (DuckDB inequality join). */
class RangeJoinSpec extends SparkSpecBase {

  import spark.implicits._

  private val Hour = 3600L * 1000000

  private def tsDf(name: String, rows: Seq[(Long, String)], tsCol: String): DataFrame =
    rows.toDF(name, tsCol).withColumn(tsCol, to_timestamp(col(tsCol)))

  test("boundaries: start inclusive, end exclusive; multi-bin interval matches once") {
    val points = tsDf("pid", Seq(
      (1L, "2024-01-01 10:00:00"),  // == start -> IN
      (2L, "2024-01-01 21:59:59"),  // last second -> IN
      (3L, "2024-01-01 22:00:00"),  // == end -> OUT
      (4L, "2024-01-01 09:59:59")), // before start -> OUT
      "pts")
    // one 12-hour interval over 1-hour bins: explodes to 12 bins, yet
    // each in-range point pairs with it exactly ONCE
    val intervals = Seq((100L, "2024-01-01 10:00:00", "2024-01-01 22:00:00"))
      .toDF("iid", "start", "end")
      .withColumn("start", to_timestamp(col("start")))
      .withColumn("end", to_timestamp(col("end")))
    val got = RangeJoin.pointInInterval(points, intervals, Seq.empty,
        "pts", "start", "end", binMicros = Hour)
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().sorted
    assert(got === Array((1L, 100L), (2L, 100L)))
  }

  test("empty and inverted intervals match nothing") {
    val points = tsDf("pid", Seq((1L, "2024-01-01 10:00:00")), "pts")
    val intervals = Seq(
      (1L, "2024-01-01 10:00:00", "2024-01-01 10:00:00"), // empty
      (2L, "2024-01-01 12:00:00", "2024-01-01 08:00:00")) // inverted
      .toDF("iid", "start", "end")
      .withColumn("start", to_timestamp(col("start")))
      .withColumn("end", to_timestamp(col("end")))
    assert(RangeJoin.pointInInterval(points, intervals, Seq.empty,
      "pts", "start", "end", binMicros = Hour).count() === 0)
  }

  test("keyed differential vs the naive inequality join on real events") {
    val ev = Tables.events(spark, sf0001)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
        col("user_id"))
    val windows = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("window_start"),
        (col("ts") + expr("INTERVAL 24 HOURS")).as("window_end"))

    val bucketed = RangeJoin.pointInInterval(clicks, windows, Seq("user_id"),
        "click_ts", "window_start", "window_end", binMicros = 4 * Hour)
      .select(col("click_id"), col("purchase_id"))
      .as[(Long, Long)].collect().sorted.toSeq

    val naive = clicks.join(windows,
        clicks("user_id") === windows("user_id") &&
          clicks("click_ts") >= windows("window_start") &&
          clicks("click_ts") < windows("window_end"))
      .select(col("click_id"), col("purchase_id"))
      .as[(Long, Long)].collect().sorted.toSeq

    assert(bucketed.nonEmpty && bucketed === naive)
  }

  test("unkeyed: bucketed plan is an equi-join; naive control nested-loops") {
    val points = tsDf("pid", (1L to 50L).map(i =>
      (i, f"2024-01-01 ${i % 24}%02d:00:00")), "pts")
    val intervals = Seq((1L, "2024-01-01 06:00:00", "2024-01-01 18:00:00"))
      .toDF("iid", "start", "end")
      .withColumn("start", to_timestamp(col("start")))
      .withColumn("end", to_timestamp(col("end")))

    val bucketed = RangeJoin.pointInInterval(points, intervals, Seq.empty,
      "pts", "start", "end", binMicros = Hour)
    val naive = points.join(intervals,
      col("pts") >= col("start") && col("pts") < col("end"))

    assert(bucketed.select(col("pid"), col("iid")).as[(Long, Long)].collect().sorted
      === naive.select(col("pid"), col("iid")).as[(Long, Long)].collect().sorted)

    bucketed.collect(); naive.collect()
    val bucketedPlan = bucketed.queryExecution.executedPlan.toString
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(!bucketedPlan.contains("BroadcastNestedLoop") &&
      !bucketedPlan.contains("CartesianProduct"),
      s"bucketed unkeyed range join must stay an equi-join:\n$bucketedPlan")
    assert(naivePlan.contains("BroadcastNestedLoop") ||
      naivePlan.contains("CartesianProduct"),
      s"control lost its point — naive no longer nested-loops:\n$naivePlan")
  }

  test("overlapJoin: half-open boundary, multi-bin pair exactly once, differential vs naive") {
    def ivals(idCol: String, sCol: String, eCol: String,
              rows: Seq[(Long, String, String)]): DataFrame =
      rows.toDF(idCol, sCol, eCol)
        .withColumn(sCol, to_timestamp(col(sCol)))
        .withColumn(eCol, to_timestamp(col(eCol)))
    val left = ivals("lid", "ls", "le", Seq(
      (1L, "2024-01-01 10:00:00", "2024-01-01 12:00:00"),
      (2L, "2024-01-01 00:00:00", "2024-01-02 00:00:00"), // spans 24 bins
      (3L, "2024-01-01 15:00:00", "2024-01-01 16:00:00")))
    val right = ivals("rid", "rs", "re", Seq(
      (10L, "2024-01-01 11:00:00", "2024-01-01 13:00:00"), // overlaps 1, 2
      (11L, "2024-01-01 12:00:00", "2024-01-01 12:30:00"), // TOUCHES 1 (le==rs): no
      (12L, "2024-01-01 03:00:00", "2024-01-01 23:00:00"), // overlaps 2 (+3,10,11 spans)
      (13L, "2024-01-02 00:00:00", "2024-01-02 01:00:00"))) // touches 2: no
    val out = RangeJoin.overlapJoin(left, right, Nil,
        "ls", "le", "rs", "re", binMicros = Hour)
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().sorted.toSeq
    // every overlapping pair EXACTLY once, half-open semantics at touches
    assert(out === Seq((1L, 10L), (1L, 12L), (2L, 10L), (2L, 11L),
      (2L, 12L), (3L, 12L)))
    // differential on real events: keyed, vs the naive inequality join
    val ev = Tables.events(spark, sf0001)
    val v = ev.where(col("event_type") === "view")
      .select(col("event_id").as("vid"), col("user_id"),
        col("ts").as("vs"), (col("ts") + expr("INTERVAL 40 MINUTES")).as("ve"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("puid"),
        col("ts").as("ps"), (col("ts") + expr("INTERVAL 25 MINUTES")).as("pe"))
    val fast = RangeJoin.overlapJoin(v,
        p.withColumnRenamed("puid", "user_id"), Seq("user_id"),
        "vs", "ve", "ps", "pe", binMicros = Hour / 2)
      .select(col("vid"), col("pid")).as[(Long, Long)].collect().sorted.toSeq
    val naive = v.join(p, v("user_id") === p("puid") &&
        v("vs") < p("pe") && p("ps") < v("ve"))
      .select(col("vid"), col("pid")).as[(Long, Long)].collect().sorted.toSeq
    assert(fast === naive)
    assert(fast.nonEmpty, "differential vacuous — no overlapping pairs")
  }
}
