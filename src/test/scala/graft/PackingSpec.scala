package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Packing invariants beyond the oracle rows (pack_chunk / pack_nextfit /
  * pack_summary hash-match DuckDB at sf0.01): bin-capacity and
  * completeness guarantees, the oversize-singleton edge the corpus never
  * exercises, determinism under re-partitioning, chunk/next-fit
  * consistency, and the plan shape (exactly one shuffle for the
  * sequential pass). */
class PackingSpec extends SparkSpecBase {

  import spark.implicits._

  // shard a: 60+200+100+90 tokens at cap 256 → bins [60+100? no — order!]
  // docs are packed in doc_id order: 60, 200 (60+200>256 → bin1), 100
  // (200+100>256 → bin2), 90 (100+90≤256 → bin2).
  private def mk(rows: (String, Long, Int)*): DataFrame =
    rows.toSeq.toDF("source", "doc_id", "n").select(
      col("source"), col("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), col("n")), _ => lit("w")))
        .as("text"))

  private lazy val docs = mk(
    ("a", 1L, 60), ("a", 2L, 200), ("a", 3L, 100), ("a", 4L, 90),
    ("b", 1L, 300), // oversize: alone in bin 0, overflowing
    ("b", 2L, 10))

  test("nextFitPack: exact bins on a hand-computed fixture") {
    val got = Packing.nextFitPack(docs, 256)
      .orderBy("shard", "doc_id")
      .select("shard", "doc_id", "bin_id").as[(String, Long, Long)]
      .collect().toSeq
    assert(got === Seq(
      ("a", 1L, 0L), ("a", 2L, 1L), ("a", 3L, 2L), ("a", 4L, 2L),
      ("b", 1L, 0L), ("b", 2L, 1L)))
  }

  test("nextFitPack: capacity holds for every multi-doc bin; " +
    "oversize docs are singletons; ids are dense from 0") {
    val packed = Packing.nextFitPack(docs, 256)
    val bins = packed.groupBy("shard", "bin_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n"))
      .collect()
    bins.foreach { r =>
      val (fill, n) = (r.getLong(2), r.getLong(3))
      assert(fill <= 256 || n == 1L,
        s"overfull multi-doc bin: $r")
    }
    // dense bin ids per shard: max+1 == distinct count
    packed.groupBy("shard")
      .agg(max("bin_id").as("mx"), countDistinct("bin_id").as("d"))
      .collect().foreach(r => assert(r.getLong(1) + 1 == r.getLong(2)))
  }

  test("nextFitPack: every doc packed exactly once, invariant to input " +
    "partitioning") {
    val base = Packing.nextFitPack(docs, 256)
    val reparted = Packing.nextFitPack(docs.repartition(5), 256)
    assert(base.count() === docs.count())
    assert(base.except(reparted).count() === 0L &&
      reparted.except(base).count() === 0L)
  }

  test("chunkPack: spans tile each shard's stream exactly; block ids " +
    "consistent with offsets") {
    val chunked = Packing.chunkPack(docs, 256)
    val rows = chunked.orderBy("shard", "doc_id")
      .select("shard", "n_tokens", "start_off", "first_block", "last_block")
      .collect()
    var prevShard: String = null
    var expectedOff = 0L
    rows.foreach { r =>
      val (shard, n, off) = (r.getString(0), r.getLong(1), r.getLong(2))
      if (shard != prevShard) { prevShard = shard; expectedOff = 0L }
      assert(off === expectedOff, s"gap in stream at $r")
      expectedOff += n
      assert(r.getLong(3) === off / 256 && r.getLong(4) === (off + n - 1) / 256)
    }
  }

  test("packingSummary: n_bins within [min_bins, 2*min_bins] (next-fit " +
    "bound) and util_ppm consistent") {
    val s = Packing.packingSummary(Packing.nextFitPack(docs, 256), 256)
    s.collect().foreach { r =>
      val (tot, nb, mb, util) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nb >= mb && nb <= 2 * mb + 1)
      assert(util === tot * 1000000L / (nb * 256))
    }
  }

  test("plan: nextFitPack shuffles exactly once (shard clustering), " +
    "no extra exchange from the sort") {
    val plan = Packing.nextFitPack(docs, 256)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 shuffle, plan:\n$plan")
  }

  test("chunkPackGlobal: one tiled global stream matching the window " +
    "form, invariant to input partitioning") {
    import spark.implicits._
    val docs = (1 to 300)
      .map(i => (i.toLong, Seq.fill((i * 31) % 40 + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "start_off", "first_block", "last_block")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val global = canon(graft.operators.Packing.chunkPackGlobal(docs, 64))
    val reparted = canon(
      graft.operators.Packing.chunkPackGlobal(docs.repartition(11), 64))
    assert(global === reparted)
    // equals the per-shard window form run with ONE shard
    val windowed = canon(graft.operators.Packing.chunkPack(
      docs.withColumn("source", lit("all")), 64))
    assert(global === windowed)
    // exact tiling: offsets are contiguous from 0 in doc order
    val sortedOffs = global.toSeq.sortBy(_._1)
    var expect = 0L
    val toks = docs.collect().map(r =>
      r.getLong(0) -> r.getString(1).split(" ").length.toLong).toMap
    sortedOffs.foreach { case (id, (off, _, _)) =>
      assert(off === expect, s"gap at doc $id")
      expect += toks(id)
    }
  }

  test("nextFitPack: a null shard key with an oversize first doc still " +
    "opens bin 0") {
    import spark.implicits._
    val docs = Seq((Option.empty[String], 1L, 300), (None, 2L, 10))
      .toDF("source", "doc_id", "n").select(
        col("source"), col("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), col("n")), _ => lit("w")))
          .as("text"))
    val got = Packing.nextFitPack(docs, 256)
      .orderBy("doc_id").select("doc_id", "bin_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got === Seq(1L -> 0L, 2L -> 1L))
  }
}
