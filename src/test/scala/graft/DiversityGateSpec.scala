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
}
