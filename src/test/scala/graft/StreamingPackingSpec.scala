package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Packing
import graft.streaming.StreamingPacking
import graft.streaming.StreamingPacking.DocTok

/** Streaming next-fit packing: batch parity in one micro-batch,
  * prefix-stability across a batch split (bins continue, ids never
  * restart), and capacity invariants under out-of-order arrival. */
class StreamingPackingSpec extends SparkSpecBase {
  import spark.implicits._

  // the PackingSpec fixture: two shards, an oversize doc, multi-bin packing
  private val fixture = Seq(
    ("a", 1L, 60), ("a", 2L, 200), ("a", 3L, 100), ("a", 4L, 90),
    ("b", 1L, 300), ("b", 2L, 10))

  private def docsDF(rows: Seq[(String, Long, Int)]) =
    rows.toDF("source", "doc_id", "n").select(
      col("source"), col("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), col("n")), _ => lit("w")))
        .as("text"))

  private def toks(rows: Seq[(String, Long, Int)]): Seq[DocTok] =
    rows.map { case (s, id, n) => DocTok(s, id, n.toLong) }

  private def runBatches(name: String,
                         batches: Seq[DocTok]*): Map[(String, Long), Long] = {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[DocTok]
    val q = StreamingPacking.nextFitStream(in.toDS(), 256)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    } finally q.stop()
  }

  private lazy val batchResult: Map[(String, Long), Long] =
    Packing.nextFitPack(docsDF(fixture), 256)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
      .toMap

  test("one micro-batch: bit-identical to the batch operator") {
    assert(runBatches("spk_one", toks(fixture)) === batchResult)
  }

  test("split micro-batches in doc order: bins continue across batches, " +
    "result identical to batch") {
    val (b1, b2) = fixture.partition { case (_, id, _) => id <= 2 }
    assert(runBatches("spk_split", toks(b1), toks(b2)) === batchResult)
    // three-way split, uneven
    val parts = Seq(fixture.take(1), fixture.slice(1, 4), fixture.drop(4))
    assert(runBatches("spk_three", parts.map(toks): _*) === batchResult)
  }

  test("out-of-order arrival: a different but VALID packing — capacity " +
    "holds for multi-doc bins, ids dense from 0") {
    val reversed = fixture.reverse
    val got = runBatches("spk_rev", toks(reversed.take(3)),
      toks(reversed.drop(3)))
    assert(got.keySet === batchResult.keySet)
    val byTok = fixture.map { case (s, id, n) => (s, id) -> n.toLong }.toMap
    got.groupBy { case ((s, _), bin) => (s, bin) }.foreach {
      case (_, members) =>
        val fill = members.keys.map(byTok).sum
        assert(fill <= 256 || members.size == 1)
    }
    got.groupBy { case ((s, _), _) => s }.foreach { case (_, m) =>
      val bins = m.values.toSet
      assert(bins === (0L until bins.size).toSet)
    }
  }
}
