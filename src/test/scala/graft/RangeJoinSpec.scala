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
}
