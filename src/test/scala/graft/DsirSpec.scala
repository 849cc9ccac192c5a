package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** DSIR importance selection (`ext_dsir_select`): the whole chain —
  * md5 bucket hashing, add-1-smoothed bucket costs through the
  * quantized-ln integer chain, per-doc weight sums — re-derived by an
  * INDEPENDENT in-memory driver implementation (java MessageDigest +
  * bit-twiddled exponent vs Spark's conv/substring/md5 SQL and the
  * typedLit array fold); exact top-k semantics; threshold-gate
  * agreement within the sketch band; null-text pass-through. */
class DsirSpec extends SparkSpecBase {

  private val buckets = 16
  private val seed = "dsirspec"

  // -- independent driver chain -------------------------------------
  private def md5Bucket(token: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest((token + ":" + seed).getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    ((java.lang.Long.parseLong(hex, 16) % 1000000L) % buckets).toInt
  }

  private def quantCost(r: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(r / 1000)
    val m = (r >> e).toInt
    e * 693147L + math.round(StrictMath.log(m / 1000.0) * 1e6)
  }

  private def cost(total: Long, c: Long): Long =
    quantCost(math.min((total + buckets) * 1000L / (c + 1L), 8192000L))

  private def driverWeights(raw: Seq[(Long, String)],
                            target: Seq[(Long, String)]): Map[Long, Long] = {
    def counts(docs: Seq[(Long, String)]): Array[Long] = {
      val a = Array.fill(buckets)(0L)
      docs.filter(_._2 != null).flatMap(_._2.split(" ", -1))
        .foreach(t => a(md5Bucket(t)) += 1L)
      a
    }
    val cRaw = counts(raw); val cTar = counts(target)
    val tRaw = cRaw.sum; val tTar = cTar.sum
    val diff = (0 until buckets)
      .map(b => cost(tRaw, cRaw(b)) - cost(tTar, cTar(b)))
    raw.filter(_._2 != null).map { case (id, text) =>
      id -> text.split(" ", -1).map(t => diff(md5Bucket(t))).sum
    }.toMap
  }

  private def corpus: Seq[(Long, String)] =
    Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  test("logw matches the independent driver chain on real corpus") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
    val target = docs.filter(col("source").isin("src0", "src1"))
    val model = TextAnalysis.dsirTrain(docs, target, buckets, seed, "md5")
    val got = TextAnalysis.dsirLogWeights(docs, model).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val targetIds = target.select("doc_id").collect().map(_.getLong(0)).toSet
    val raw = corpus
    val want = driverWeights(raw, raw.filter(t => targetIds(t._1)))
    assert(got.keySet === want.keySet)
    assert(got.nonEmpty)
    got.foreach { case (id, w) => assert(w === want(id), s"doc $id") }
  }

  test("select keeps exactly the top-k under (logw DESC, doc_id); null text unselected") {
    import spark.implicits._
    val docs = Seq(
      (0L, "aa bb aa"), (1L, "aa aa aa"), (2L, "cc dd"), (3L, "bb cc"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val target = docs.filter(col("doc_id") < 2)
    val model = TextAnalysis.dsirTrain(docs, target, buckets, seed, "md5")
    val out = TextAnalysis.dsirSelect(docs, model, k = 2).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
      .toMap
    assert(out.size === 5)
    // null text: weight NULL, never selected
    assert(out(4L)._1.isEmpty && !out(4L)._2)
    val scored = out.collect { case (id, (Some(w), sel)) => (id, w, sel) }
    val topk = scored.toSeq.sortBy { case (id, w, _) => (-w, id) }.take(2)
      .map(_._1).toSet
    scored.foreach { case (id, _, sel) => assert(sel === topk(id), s"doc $id") }
    assert(scored.count(_._3) === 2)
  }

  test("threshold gate agrees with exact top-k within the sketch band") {
    val docs = Tables.documents(spark, sf0001)
    val target = docs.filter(col("source").isin("src0", "src1"))
    val model = TextAnalysis.dsirTrain(docs, target, buckets, seed, "md5")
    val scored = TextAnalysis.dsirLogWeights(docs, model)
    val n = scored.filter(col("logw_micro").isNotNull).count()
    val keep = 0.3
    val k = math.max(1, math.round(n * keep).toInt)
    val exact = TextAnalysis.dsirSelect(docs, model, k)
      .filter(col("selected")).collect().map(_.getLong(0)).toSet
    val thr = TextAnalysis.dsirThreshold(scored, keep)
    val gated = TextAnalysis.dsirGateWith(scored, thr)
      .filter(col("selected")).collect().map(_.getLong(0)).toSet
    val overlap = (exact & gated).size.toDouble / exact.size
    assert(overlap >= 0.9, s"overlap $overlap (exact ${exact.size}, " +
      s"gated ${gated.size})")
  }
}
