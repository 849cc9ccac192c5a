package graft.streaming

import org.apache.spark.sql.SparkSession

/** Scale-adaptive state partitioning for the streaming operators
  * (round 16, optimization guide §2.2/§2.4).
  *
  * A stateful streaming query's state is hash-partitioned into
  * `spark.sql.shuffle.partitions` state stores, FIXED at the first
  * checkpoint — and every micro-batch pays one task + one state-store
  * commit (delta file write, fsync, commit-log entry) PER PARTITION PER
  * STATEFUL OPERATOR, whether or not the partition holds any data. A
  * stream-stream join keeps four stores per partition. With the session
  * default pinned to the core count (32 locally), a bounded 6-micro-batch
  * interval join pays ~770 store commits to move a few thousand rows:
  * state machinery, not computation — and AQE cannot help, because
  * adaptive coalescing does not apply to streaming state exchanges.
  *
  * The fix is the guide's partitioning rule: derive the partition count
  * from the DATA, not from the host. [[statePartitionsFor]] sizes state
  * partitions from the stream's input row count at a configurable
  * rows-per-partition target — small bounded fixtures get a handful of
  * stores (overhead collapses ~16×), while a 10-billion-row production
  * stream gets thousands (the same formula, no local-mode constant). The
  * resulting partition count only changes WHERE state rows live, never
  * their values: every stream row's oracle hash is partition-count
  * independent (verified — the full registry passes the DuckDB oracle
  * under this dispatch).
  *
  * Knobs (production values justified in OPTIMIZATION_r16.md):
  *  - `spark.graft.stream.rowsPerStatePartition` (env
  *    `SPARK_GRAFT_STREAM_ROWS_PER_PARTITION`, default 1e6): target input
  *    rows per state partition — ~10²–10³ bytes/row puts a partition in
  *    the guide's 100 MB–1 GB band.
  *  - `spark.graft.stream.statePartitions` (env
  *    `SPARK_GRAFT_STREAM_STATE_PARTITIONS`): explicit override, wins
  *    over the formula (cluster operators pinning a known-good value).
  */
object StreamTuning {

  /** Floor: keep every stateful operator genuinely distributed (a
    * single-store stream would hide partition-boundary bugs and
    * serialize the drain). */
  val MinStatePartitions = 2

  private def confOrEnv(spark: SparkSession, conf: String,
                        env: String): Option[Long] =
    spark.conf.getOption(conf).map(_.toLong)
      .orElse(sys.env.get(env).map(_.toLong))

  /** State partition count for a stream whose bounded input (or batch
    * volume estimate, for unbounded sources) is `inputRows`. */
  def statePartitionsFor(spark: SparkSession, inputRows: Long): Int = {
    confOrEnv(spark, "spark.graft.stream.statePartitions",
      "SPARK_GRAFT_STREAM_STATE_PARTITIONS") match {
      case Some(explicit) =>
        require(explicit >= 1, s"statePartitions must be >= 1: $explicit")
        explicit.toInt
      case None =>
        val perPartition = confOrEnv(spark,
          "spark.graft.stream.rowsPerStatePartition",
          "SPARK_GRAFT_STREAM_ROWS_PER_PARTITION").getOrElse(1000000L)
        require(perPartition >= 1,
          s"rowsPerStatePartition must be >= 1: $perPartition")
        val want = (inputRows.max(0L) + perPartition - 1) / perPartition
        want.max(MinStatePartitions.toLong).min(Int.MaxValue.toLong).toInt
    }
  }

  /** Should per-micro-batch plans (foreachBatch bodies, read-backs) run
    * under AQE inside the stream window? AQE executes each exchange as
    * its own QueryStage JOB with a driver re-optimization round between
    * stages — on a micro-plan over a few thousand rows that is pure
    * latency (round-17 event-log profile: ~6 sub-jobs + 20–300 ms gaps
    * per micro-batch on the bucketed-sink rows, none of them doing
    * anything a static plan would not). The gate is DATA-derived, the
    * statePartitionsFor rule again: a bounded stream whose whole input
    * is below one state partition's row target (`rowsPerStatePartition`,
    * default 1e6) plans micro-batches that cannot benefit from runtime
    * re-optimization — disable AQE for the window. A production stream
    * (inputRows ≥ the target) keeps AQE on for its batch-sized merges.
    * Override: `spark.graft.stream.adaptiveInBatch` / env
    * `SPARK_GRAFT_STREAM_AQE` = `on` (always) | `auto` (the rule). */
  private def adaptiveInBatch(spark: SparkSession, inputRows: Long): Boolean = {
    val mode = spark.conf.getOption("spark.graft.stream.adaptiveInBatch")
      .orElse(sys.env.get("SPARK_GRAFT_STREAM_AQE")).getOrElse("auto")
    require(mode == "on" || mode == "auto",
      s"adaptiveInBatch must be 'on' or 'auto': $mode")
    val perPartition = confOrEnv(spark,
      "spark.graft.stream.rowsPerStatePartition",
      "SPARK_GRAFT_STREAM_ROWS_PER_PARTITION").getOrElse(1000000L)
    mode == "on" || inputRows >= perPartition
  }

  /** Run `body` (typically: start a streaming query, drain it, read the
    * result back) with `spark.sql.shuffle.partitions` set from
    * [[statePartitionsFor]] (and AQE per [[adaptiveInBatch]]), restoring
    * the previous values afterwards. The conf must be set BEFORE the
    * stream starts — the first checkpoint pins it for the query's
    * lifetime. */
  def withStatePartitions[T](spark: SparkSession, inputRows: Long)
                            (body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    val prevAqe = spark.conf.get(aqeKey)
    spark.conf.set(key, statePartitionsFor(spark, inputRows).toString)
    spark.conf.set(aqeKey, adaptiveInBatch(spark, inputRows).toString)
    try body
    finally {
      spark.conf.set(key, prev)
      spark.conf.set(aqeKey, prevAqe)
    }
  }
}
