package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 ask #5 — ADVERSARIAL-SKEW curve for the (user_id,
  * event_type) window family. The salted templates (a1_salted_count)
  * prove the mechanism, but no timed row runs W1–W6 on a genuinely
  * skewed key distribution — and economic-calendar data IS skewed (a
  * few major currencies hold most rows; the reference's nunique
  * diagnostics, train.py:341-343, imply ~8 currencies over ~60k rows).
  *
  * Fixture: the ScaleBenchCheck sf1 surrogate (10× sf0.1 events with
  * per-copy user/event offsets — the UNIFORM baseline), plus a SKEWED
  * twin built from the same rows where copies 0–4 are remapped onto ONE
  * (user_id, event_type) key — one key holding ~50% of all rows, every
  * event_id still unique, total row count identical. Any window-family
  * straggler shows up as skewed/uniform time ratio >> 1 at equal data.
  *
  * What a straggler means per operator class:
  *  - W6 latest-per-group (max_by agg): partial aggregation absorbs the
  *    hot key map-side — expect ~1×.
  *  - W1/W2/W3 (order-dependent windows: lag/ffill/min-max): exact
  *    per-key windowing puts the whole hot key in ONE task — the
  *    fundamental skew bound for sequence semantics; salting is NOT
  *    sound here (it breaks row adjacency). If the ratio exceeds 1.5×,
  *    the mitigation is time-range chunking with boundary stitching,
  *    wired only where measurement says so.
  *  - W5 chrono split (distributed prefix-rank): per-key ranks via
  *    partial counts — expect mild.
  *
  * Timing is the Bench methodology: noop materialization, construction
  * untimed, fresh frame per pass, median of 3, persistent blocks
  * dropped between passes. Results go to BENCH_SF1.md ("skew" section).
  *
  * Usage: sbt "Test/runMain graft.tools.SkewWindowCheck [queryName ...]"
  */
object SkewWindowCheck {

  private val HotUser = 424242L
  private val HotType = "signup"

  /** Skewed twin of the uniform surrogate's events: copies 0–4 (half
    * the rows) remapped onto the single hot key. Same rows, same
    * values, same timestamps — only the grouping key distribution
    * changes, so uniform-vs-skewed time deltas are pure skew cost. */
  private def buildSkewedEvents(spark: SparkSession, uniformDir: String,
                                dst: String): Unit = {
    val ev = spark.read.parquet(s"$uniformDir/events.parquet")
    // the uniform surrogate encodes the copy index in the event_id
    // offset (c * 1e9, ScaleBenchCheck.buildSurrogate)
    val hot = (col("event_id") / 1000000000L).cast("long") < 5
    ev.select(
        col("event_id"),
        col("ts"),
        when(hot, lit(HotUser)).otherwise(col("user_id")).as("user_id"),
        when(hot, lit(HotType)).otherwise(col("event_type")).as("event_type"),
        col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
  }

  def main(args: Array[String]): Unit = {
    val rows =
      if (args.nonEmpty) args.toSeq
      else Seq("w1_lag", "w1_lag_chunked", "w2_fill_train",
        "w2_fill_train_chunked", "w2_fill_validate",
        "w3_minmax_normalize", "w5_chrono_split_dist",
        "w6_latest_per_group", "j5_impute_group_mean",
        // round 15: the remaining chunked pairs + the routed pipeline
        // with the window dispatch forced chunked (the registered twin)
        "w15_state_episodes", "w15_state_episodes_chunked",
        "w16_interpolate", "w16_interpolate_chunked",
        "pipeline_e2e_routed", "pipeline_e2e_routed_auto")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sf01 = "/root/testdata/sf0.1"
    val sf1 = "/tmp/graft_sf1"
    val skew = "/tmp/graft_sf1_skew"
    println("building sf1 surrogate (10x sf0.1) ...")
    ScaleBenchCheck.buildSurrogate(spark, sf01, sf1)
    println("building skewed twin (one key = 50% of rows) ...")
    buildSkewedEvents(spark, sf1, skew)
    val n = spark.read.parquet(s"$skew/events.parquet")
    val total = n.count()
    val hotRows = n.filter(col("user_id") === HotUser &&
      col("event_type") === HotType).count()
    println(f"  events $total%9d rows, hot key holds $hotRows%9d " +
      f"(${100.0 * hotRows / total}%.1f%%)")

    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    materialize(graft.Tables.events(spark, sf01)
      .groupBy(lower(col("event_type"))).count()) // warmup

    def timed(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      Array.fill(3) {
        val df = fn(spark, dir)
        val t0 = System.nanoTime()
        materialize(df)
        val sec = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        sec
      }.sorted.apply(1)
    }

    println(f"${"query"}%-24s ${"uniform s"}%10s ${"skewed s"}%10s ${"ratio"}%7s")
    for (name <- rows) {
      val u = timed(name, sf1)
      val s = timed(name, skew)
      println(f"$name%-24s $u%10.2f $s%10.2f ${s / u}%7.2f")
    }

    // the AUTO DISPATCH itself (round 15): at a realistic 100k
    // rows-per-task bound, the probe must route the uniform surrogate
    // (hottest key << 100k) to the PLAIN plans and the skew twin
    // (hot key ~500k) to the CHUNKED plans — time both so the switch's
    // realized cost is on record, not just the forced-chunked row's
    def timedPipe(dir: String): Double = {
      Array.fill(3) {
        val df = graft.Pipeline.run(spark,
          graft.Tables.events(spark, dir),
          graft.Pipeline.Config(predictor = "routed", modelThreshold = 14,
            windowRowsPerTask = 100000L)).trainMetrics
        val t0 = System.nanoTime()
        materialize(df)
        val sec = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        sec
      }.sorted.apply(1)
    }
    val pu = timedPipe(sf1)
    val ps = timedPipe(skew)
    println(f"${"routed@100k (probe)"}%-24s $pu%10.2f $ps%10.2f ${ps / pu}%7.2f" +
      "   (uniform=plain path, skewed=chunked path by probe)")
    spark.stop()
  }
}
