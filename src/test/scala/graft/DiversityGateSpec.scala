package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.TextAnalysis
import graft.streaming.StreamingCuration

/** The quantile-gated quality filter: the exact rank gate is
  * oracle-checked (ext_diversity_gate); this spec pins what the oracle
  * can't — the drop-fraction arithmetic, determinism under
  * re-partitioning, the exact/approx survivor agreement that justifies
  * shipping the sketch path at scale, and the approx plan's shape (no
  * per-group sort, broadcast threshold join). */
class DiversityGateSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf001 = "/root/testdata/sf0.01"

  private lazy val docs: DataFrame = Tables.documents(spark, sf001)

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("exact gate drops exactly floor(0.25·n) docs per language") {
    val perLang = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextAnalysis.diversityGateExact(docs, 0.25)
      .groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet === perLang.keySet)
    kept.foreach { case (lang, k) =>
      val n = perLang(lang)
      assert(k === n - math.floor(n * 0.25).toLong, s"lang $lang")
    }
  }

  test("exact gate is deterministic and partitioning-invariant") {
    val a = ids(TextAnalysis.diversityGateExact(docs, 0.25))
    val b = ids(TextAnalysis.diversityGateExact(docs.repartition(13), 0.25))
    assert(a === b)
  }

  test("approx gate agrees with exact on ≥95% of survivor decisions") {
    val exact = ids(TextAnalysis.diversityGateExact(docs, 0.25))
    val approx = ids(TextAnalysis.diversityGateApprox(docs, 0.25))
    val n = docs.count().toDouble
    val disagree = ((exact diff approx) union (approx diff exact)).size
    assert(disagree / n <= 0.05,
      s"$disagree/$n decisions differ between exact and approx gates")
  }

  test("dropFraction 0 keeps everything — BOTH forms (the approx gate's " +
    "strict '>' must not shave min-scorers); oversize fraction rejected") {
    assert(TextAnalysis.diversityGateExact(docs, 0.0).count() === docs.count())
    assert(TextAnalysis.diversityGateApprox(docs, 0.0).count() === docs.count())
    intercept[IllegalArgumentException] {
      TextAnalysis.diversityGateExact(docs, 1.0)
    }
  }

  test("gate-with-artifact: groups absent from the thresholds PASS " +
    "THROUGH — a quality filter must not become a group whitelist") {
    val thresholds = TextAnalysis.diversityThresholds(docs, 0.25)
    val unknown = Seq((90001L, "xx", "some entirely new language text here"))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.diversityGateWith(
      docs.select("doc_id", "lang", "text").unionByName(unknown), thresholds)
    assert(ids(out).contains(90001L))
    // known groups are still gated (survivor count matches the plain form)
    assert(out.count() ===
      TextAnalysis.diversityGateWith(
        docs.select("doc_id", "lang", "text"), thresholds).count() + 1)
  }

  test("plan: approx gate has no per-group sort and broadcasts the " +
    "thresholds") {
    val plan = TextAnalysis.diversityGateApprox(docs, 0.25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window/sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), s"thresholds not broadcast:\n$plan")
  }

  test("streaming gate with the batch threshold artifact matches the " +
    "batch approx gate on a replayed corpus") {
    implicit val sq = spark.sqlContext
    val thresholds = TextAnalysis.diversityThresholds(docs, 0.25).cache()
    try {
      val batchIds = ids(TextAnalysis.diversityGateWith(docs, thresholds))
      val rows = docs.select("doc_id", "lang", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      val in = MemoryStream[(Long, String, String)]
      val stream = in.toDF().toDF("doc_id", "lang", "text")
      val q = StreamingCuration.diversityGate(stream, thresholds)
        .select("doc_id")
        .writeStream.format("memory").queryName("dg_stream")
        .outputMode("append").start()
      try {
        val (b1, b2) = rows.splitAt(rows.size / 2)
        in.addData(b1); q.processAllAvailable()
        in.addData(b2); q.processAllAvailable()
        val streamIds = spark.table("dg_stream").collect()
          .map(_.getLong(0)).toSet
        assert(streamIds === batchIds)
      } finally q.stop()
    } finally { thresholds.unpersist(); () }
  }

  test("curriculumOrder: round-robin strata interleave, exact positions, partitioning-invariant") {
    // 6 rows, 3 buckets: ranking by (score desc, id) is ids 6,5,4,3,2,1;
    // strata {6,5} {4,3} {2,1}; interleave rounds -> 6,4,2,5,3,1
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L),
      (6L, 60L)).toDF("doc_id", "score")
    val expected = Map(6L -> 1L, 4L -> 2L, 2L -> 3L, 5L -> 4L, 3L -> 5L, 1L -> 6L)
    for (parts <- Seq(1, 5)) {
      val got = TextAnalysis.curriculumOrder(df.repartition(parts),
        col("score"), "doc_id", buckets = 3)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("position")).toMap
      assert(got === expected, s"parts=$parts")
    }
    // uneven strata (7 rows, 3 buckets -> sizes 3,2,2): every position
    // 1..n exactly once and stratum sizes follow the floor cut
    val df7 = (1L to 7L).map(i => (i, i * 10)).toDF("doc_id", "score")
    val out = TextAnalysis.curriculumOrder(df7, col("score"), "doc_id", 3)
      .collect()
    assert(out.map(_.getAs[Long]("position")).sorted.toSeq === (1L to 7L))
    val sizes = out.groupBy(_.getAs[Long]("bucket")).view
      .mapValues(_.length).toMap
    assert(sizes === Map(0L -> 3, 1L -> 2, 2L -> 2))
    // reserved-name guard
    assertThrows[IllegalArgumentException] {
      TextAnalysis.curriculumOrder(
        df.withColumn("position", lit(1)), col("score"), "doc_id", 3)
    }
  }
}
