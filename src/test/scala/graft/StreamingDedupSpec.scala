package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{BandedSketch, CandidatePair}

/** Pins the streaming dedup composition: exact dedup state across
  * micro-batches, streaming-vs-batch sketch parity, and the stateful
  * band-bucket candidate generator. */
class StreamingDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val nearDupA = "the quick brown fox jumps over the lazy dog near the river bank"
  private val nearDupB = "the quick brown fox jumps over the lazy dog near the river shore"
  private val unrelated = "completely different words about spark shuffles and partitions here"

  test("exactDedupStream: first arrival survives, re-arrivals across batches are dropped") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = in.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingDedup.exactDedupStream(docs, "ts", "1 hour")
      .writeStream.format("memory").queryName("sdd_exact").outputMode("append").start()
    try {
      in.addData((1L, nearDupA, ts("2025-01-05 10:00:00")),
        (2L, unrelated, ts("2025-01-05 10:01:00")))
      q.processAllAvailable()
      // batch 2: doc 3 repeats doc 1's text (dropped), doc 4 is new
      in.addData((3L, nearDupA, ts("2025-01-05 10:05:00")),
        (4L, nearDupB, ts("2025-01-05 10:06:00")))
      q.processAllAvailable()
      val ids = spark.table("sdd_exact").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("sketchStream produces bit-identical sketches to the batch path") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.sketchStream(docs, n = 3)
      .writeStream.format("memory").queryName("sdd_sketch").outputMode("append").start()
    try {
      in.addData((1L, nearDupA), (2L, nearDupB), (3L, unrelated))
      q.processAllAvailable()
      val streaming = spark.table("sdd_sketch").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = graft.operators.Dedup.simhashSketch(
        Seq((1L, nearDupA), (2L, nearDupB), (3L, unrelated)).toDF("doc_id", "text"),
        n = 3).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
      assert(streaming === batch)
    } finally q.stop()
  }

  test("candidatePairStream: bucket state spans micro-batches, near-dups pair, unrelated don't, re-deliveries don't duplicate") {
    implicit val sq = spark.sqlContext
    // The operator's processing-time idle timeout makes the engine
    // schedule no-data micro-batches continuously under the default
    // trigger, which livelocks processAllAvailable in a test; with
    // no-data batches off, timeouts evaluate when data arrives — the
    // same state bound, test-friendly pacing.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val in = MemoryStream[(Long, String)]
    val sketches = StreamingDedup.sketchStream(in.toDF().toDF("doc_id", "text"), n = 3)
    val bandedStream = StreamingDedup.banded(spark, sketches)
    val q = StreamingDedup.candidatePairStream(spark, bandedStream, maxDist = 8)
      .writeStream.format("memory").queryName("sdd_cand").outputMode("append").start()
    try {
      in.addData((1L, nearDupA), (3L, unrelated))
      q.processAllAvailable()
      assert(spark.table("sdd_cand").count() === 0) // nothing near yet
      // batch 2: an exact dup of doc 1 arrives (distance 0 — guaranteed
      // band collision), plus a re-delivery of doc 1 itself
      in.addData((2L, nearDupA), (1L, nearDupA))
      q.processAllAvailable()
      val got = spark.table("sdd_cand").as[CandidatePair].collect()
        .map(p => (p.docA, p.docB)).toSet // same pair may surface per band
      assert(got === Set((1L, 2L)))
      val hams = spark.table("sdd_cand").as[CandidatePair].collect().map(_.hamming).toSet
      assert(hams === Set(0))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
    }
  }
}
