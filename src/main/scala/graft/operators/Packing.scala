package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step between a curated document corpus and a
  * training batch: fixed-capacity token budgets have to be filled from
  * variable-length documents. Two industry-standard policies, both
  * deterministic and shard-parallel:
  *
  *   - **Concat-and-chunk** ([[chunkPack]]): concatenate every document in
  *     a shard in a fixed order and cut the token stream into
  *     `capacity`-token blocks; a document may straddle blocks (the
  *     GPT-style pretraining layout). Pure per-shard window arithmetic —
  *     whole-stage codegen, one shuffle on the shard key, no state.
  *   - **Next-fit whole-document bins** ([[nextFitPack]]): walk the shard
  *     in order, appending each document to the current bin while it fits,
  *     else sealing the bin and opening a new one (the no-cross-attention
  *     layout where documents are never split). Inherently a sequential
  *     scan per shard, so it runs as a typed `mapPartitions` over
  *     shard-clustered, shard-sorted partitions — the one shape where
  *     imperative per-partition code is the honest plan.
  *
  * Token counts are whitespace tokens (`size(split(text, ' '))`) — ONE
  * definition shared with `ext_token_count`'s `n_ws_tokens` so packing
  * budgets and token accounting can never disagree.
  *
  * Scale: the shard column is the parallelism unit — at corpus scale there
  * are thousands of shards (source domain, crawl file, hash bucket), each
  * packed independently; no global order, no global state. A pathological
  * mega-shard serializes its own scan only; pre-split it upstream with a
  * finer shard key (the [[Features.hotKeys]] detector applies unchanged).
  * Next-fit (vs first-fit/best-fit) is deliberate: it is the only
  * classical bin-packing policy that needs O(1) state per shard and no
  * random access, i.e. the only one that streams — and its waste is
  * bounded (≤ 2× optimal bins; in practice ~1.1× on web-doc length
  * distributions).
  *
  * Reference scope: the reference pipeline feeds fixed-length sequences to
  * its LSTM trainer (fastapi model/ML Pipeline/train.py:163-199 builds
  * look-back windows); packing is the corpus-scale generalization of that
  * batching step.
  */
object Packing {

  /** Whitespace token count — THE one definition every packing surface
    * (per-shard chunk, global chunk, batch next-fit, streaming next-fit
    * via [[graft.streaming.StreamingPacking.tokenize]]) derives budgets
    * from, shared with ext_token_count's `n_ws_tokens`. NULL text reads
    * as the empty document (one empty token — `split("")` is `[""]`). */
  private[graft] def tokenCount(c: Column): Column =
    size(split(coalesce(c, lit("")), " ")).cast("long")

  /** Concat-and-chunk layout. For each document: its token span
    * `[start_off, start_off + n_tokens)` in the shard's concatenated
    * stream, the first and last `capacity`-token block it lands in, and
    * how many blocks it straddles. Every column is exact integer
    * arithmetic (BIGINT offsets, truncating division) — reproducible in
    * any engine. */
  def chunkPack(
      docs: DataFrame,
      capacity: Int,
      shardCol: String = "source",
      orderCol: String = "doc_id"): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    docs
      .select(col(shardCol).as("shard"), col(orderCol).as("doc_id"),
        tokenCount(col("text")).as("n_tokens"))
      .withColumn("end_off", sum(col("n_tokens")).over(
        Window.partitionBy("shard").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      .select(
        col("shard"), col("doc_id"), col("n_tokens"), col("start_off"),
        expr(s"start_off DIV $capacity").as("first_block"),
        // n_tokens ≥ 1 always (split of "" is [""]), so end_off-1 ≥ start_off
        expr(s"(end_off - 1) DIV $capacity").as("last_block"))
      .withColumn("n_blocks", col("last_block") - col("first_block") + lit(1L))
  }

  // public: Spark's encoder codegen instantiates these in generated
  // classes and cannot touch private members
  case class TokDoc(shard: String, doc_id: Long, n_tokens: Long)
  case class Packed(
      shard: String, doc_id: Long, n_tokens: Long, bin_id: Long)

  /** Next-fit whole-document bins. Within each shard (ordered by
    * `orderCol`): the first document opens bin 0; each subsequent document
    * joins the current bin if `fill + n_tokens ≤ capacity`, else opens the
    * next bin. A document longer than `capacity` gets a bin to itself that
    * overflows — classic next-fit; truncate oversize documents upstream if
    * hard caps are required.
    *
    * Plan shape: one hash shuffle on the shard key
    * (`repartition(shardCol)`), an in-partition sort, then a map-only
    * sequential pass with O(1) state — the minimal plan for
    * order-dependent packing. */
  def nextFitPack(
      docs: DataFrame,
      capacity: Int,
      shardCol: String = "source",
      orderCol: String = "doc_id"): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(shardCol).cast("string").as("shard"),
        col(orderCol).cast("long").as("doc_id"),
        tokenCount(col("text")).as("n_tokens"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .as[TokDoc]
      .mapPartitions { rows =>
        // explicit started flag, not a null-shard sentinel: a genuine
        // null shard key would otherwise compare equal to the initial
        // state and mis-bin an oversize first document (the streaming
        // twin StreamingPacking carries the same flag in its state)
        var started = false
        var shard: String = null
        var fill = 0L
        var bin = 0L
        rows.map { d =>
          if (!started || d.shard != shard) {
            started = true; shard = d.shard; bin = 0L; fill = d.n_tokens
          }
          else if (fill + d.n_tokens <= capacity) fill += d.n_tokens
          else { bin += 1L; fill = d.n_tokens }
          Packed(d.shard, d.doc_id, d.n_tokens, bin)
        }
      }
      .toDF()
  }

  /** GLOBAL concat-and-chunk — one corpus-wide token stream in `orderCol`
    * order, no shard key: the distributed prefix-SUM pattern
    * ([[graft.operators.Features.withGlobalRowNumber]]'s prefix-rank,
    * generalized from row counts to token counts). Pass 1: range
    * repartition + in-partition sort, then one tiny job collects
    * per-partition token totals (O(partitions) rows) and the driver takes
    * their exclusive prefix. Pass 2: map-only — each partition streams
    * its rows adding its offset to a running local sum. No window, no
    * single-partition stage; the sorted frame is lazily checkpointed so
    * the two passes share one sort. Same output columns and block
    * arithmetic as [[chunkPack]]; `orderCol` must be globally unique. */
  def chunkPackGlobal(docs: DataFrame, capacity: Int,
                      orderCol: String = "doc_id",
                      numPartitions: Int = 0): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = docs.sparkSession
    val p = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = docs
      .select(col(orderCol).cast("long").as("doc_id"),
        tokenCount(col("text")).as("n_tokens"))
      .repartitionByRange(p, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .localCheckpoint(eager = false)
    val partTotals = sorted.rdd
      .mapPartitionsWithIndex { (i, it) =>
        Iterator.single((i, it.foldLeft(0L)(_ + _.getLong(1))))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("start_off",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val withOffsets = spark.createDataFrame(
      sorted.rdd.mapPartitionsWithIndex { (i, it) =>
        var acc = bc.value(i)
        it.map { r =>
          val n = r.getLong(1)
          val start = acc
          acc += n
          org.apache.spark.sql.Row(r.getLong(0), n, start)
        }
      }, schema)
    withOffsets
      .withColumn("end_off", col("start_off") + col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("start_off"),
        expr(s"start_off DIV $capacity").as("first_block"),
        expr(s"(end_off - 1) DIV $capacity").as("last_block"))
      .withColumn("n_blocks", col("last_block") - col("first_block") + lit(1L))
  }

  /** Per-shard packing summary over a [[nextFitPack]] result: bins used,
    * the next-fit lower bound ceil(total/capacity), and utilization in
    * exact parts-per-million of `n_bins · capacity`. */
  def packingSummary(packed: DataFrame, capacity: Int): DataFrame =
    packed.groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      sum("n_tokens").as("total_tokens"),
      (max("bin_id") + lit(1L)).as("n_bins"))
      .withColumn("min_bins",
        expr(s"(total_tokens + ${capacity - 1}) DIV $capacity"))
      .withColumn("util_ppm",
        expr(s"(total_tokens * 1000000L) DIV (n_bins * $capacity)"))
      .orderBy("shard")
}
