package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.UrlCuration

/** URL curation (`ext_url_normalize` / `ext_url_dedup` /
  * `ext_domain_cap`): hand URLs isolate each normalization rule (the
  * corpus oracle only exercises the synthesized combinations), dedup
  * first-occurrence and cap boundary semantics are pinned, the blocklist
  * matches subdomains, and the two cap forms agree on volume. */
class UrlCurationSpec extends SparkSpecBase {

  private def normOf(url: String): (String, String) = {
    import spark.implicits._
    val r = UrlCuration.normalizeUrls(
      Seq((0L, url)).toDF("doc_id", "url")).head()
    (r.getAs[String]("url_norm"), r.getAs[String]("domain"))
  }

  test("normalize: each rule in isolation") {
    // scheme + host case
    assert(normOf("HTTPS://ExAmPle.COM/a")._1 === "https://example.com/a")
    // www strip (one leading www. only)
    assert(normOf("https://www.example.com/a")._1 === "https://example.com/a")
    assert(normOf("https://www.www.example.com/a")._1 ===
      "https://www.example.com/a")
    // default ports dropped, non-default kept, scheme-sensitive
    assert(normOf("https://example.com:443/a")._1 === "https://example.com/a")
    assert(normOf("http://example.com:80/a")._1 === "http://example.com/a")
    assert(normOf("http://example.com:443/a")._1 ===
      "http://example.com:443/a")
    assert(normOf("https://example.com:8443/a")._1 ===
      "https://example.com:8443/a")
    // trailing slashes stripped; bare root becomes "/"
    assert(normOf("https://example.com/a///")._1 === "https://example.com/a")
    assert(normOf("https://example.com")._1 === "https://example.com/")
    assert(normOf("https://example.com/")._1 === "https://example.com/")
    // fragment dropped
    assert(normOf("https://example.com/a#sec")._1 === "https://example.com/a")
    // tracking params dropped, survivors sorted bytewise, empty query → no ?
    assert(normOf("https://example.com/a?b=2&a=1")._1 ===
      "https://example.com/a?a=1&b=2")
    assert(normOf("https://example.com/a?utm_source=x&utm_medium=y")._1 ===
      "https://example.com/a")
    assert(normOf("https://example.com/a?gclid=g&z=9&fbclid=f&msclkid=m")._1
      === "https://example.com/a?z=9")
    // everything at once
    assert(normOf(
      "HTTPS://WWW.Example.COM:443/p/1/?b=2&a=1&utm_source=f&gclid=g#frag")._1
      === "https://example.com/p/1?a=1&b=2")
    // domain column
    assert(normOf("https://WWW.News.Example.com:9/x")._2 ===
      "news.example.com")
  }

  test("normalize: unparseable input surfaces NULL, never a fabrication") {
    import spark.implicits._
    val out = UrlCuration.normalizeUrls(Seq(
      (0L, "not a url"),
      (1L, "://missing-scheme.com/a"),
      (2L, "https:///no-host"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "url")).collect()
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("url_norm")), r.toString)
      assert(r.isNullAt(r.fieldIndex("domain")), r.toString)
    }
  }

  test("blocklist: exact and subdomain hits, NULL domain → NULL verdict") {
    import spark.implicits._
    val normed = UrlCuration.normalizeUrls(Seq(
      (0L, "https://bad.com/x"),
      (1L, "https://sub.bad.com/x"),
      (2L, "https://notbad.com/x"),   // suffix of name, NOT a subdomain
      (3L, "https://good.com/x"),
      (4L, "nonsense")).toDF("doc_id", "url"))
    val v = normed.select(col("doc_id"),
      UrlCuration.blocklistVerdict(col("domain"), Seq("bad.com"))
        .as("blocked")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
                                 else Some(r.getBoolean(1)))).toMap
    assert(v(0L) === Some(true))
    assert(v(1L) === Some(true))
    assert(v(2L) === Some(false))
    assert(v(3L) === Some(false))
    assert(v(4L) === None)
  }

  test("urlDedup: lowest doc_id per canonical URL wins; NULL stays NULL") {
    import spark.implicits._
    val normed = UrlCuration.normalizeUrls(Seq(
      (5L, "https://a.com/x?b=2&a=1"),
      (2L, "HTTPS://WWW.A.com:443/x/?a=1&b=2&utm_source=s#f"), // same canon
      (9L, "https://a.com/y"),
      (7L, "broken")).toDF("doc_id", "url"))
    val kept = UrlCuration.urlDedup(normed).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        (if (r.isNullAt(r.fieldIndex("kept"))) None
         else Some(r.getBoolean(r.fieldIndex("kept"))))).toMap
    assert(kept(2L) === Some(true))   // first under doc_id order
    assert(kept(5L) === Some(false))  // later echo of the same canon
    assert(kept(9L) === Some(true))   // unique URL
    assert(kept(7L) === None)         // unparseable: not deduped
    assert(kept.size === 4)           // mode-as-data: no row vanished
  }

  test("domainCap: exact form keeps exactly min(cap, n) per domain; " +
       "threshold form agrees on volume within the binomial band") {
    import spark.implicits._
    // 40 docs on one domain, 3 on another, 1 on a third
    val docs = ((0L until 40L).map(i => (i, s"https://big.com/p/$i")) ++
      Seq((100L, "https://mid.com/1"), (101L, "https://mid.com/2"),
        (102L, "https://mid.com/3"), (200L, "https://one.com/1")))
      .toDF("doc_id", "url")
    val normed = UrlCuration.normalizeUrls(docs)
    val exact = UrlCuration.domainCap(normed, cap = 5, seed = "t")
    val perDomain = exact.filter(col("cap_kept"))
      .groupBy(col("domain")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perDomain("big.com") === 5L)
    assert(perDomain("mid.com") === 3L)
    assert(perDomain("one.com") === 1L)
    // exact form is layout-invariant
    val reshuffled = UrlCuration.domainCap(
      normed.repartition(7, col("doc_id")), cap = 5, seed = "t")
    assert(exact.select("doc_id", "cap_kept").collect().toSet ===
      reshuffled.select("doc_id", "cap_kept").collect().toSet)
    // threshold form: small domains (n <= cap) keep everything exactly;
    // the big domain lands within a generous binomial band around cap
    val thr = UrlCuration.domainCapThreshold(normed, cap = 5, seed = "t")
    val thrPer = thr.filter(col("cap_kept"))
      .groupBy(col("domain")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(thrPer("mid.com") === 3L)
    assert(thrPer("one.com") === 1L)
    val big = thrPer.getOrElse("big.com", 0L)
    assert(big >= 1L && big <= 12L, s"threshold kept $big of 40, cap 5")
  }

  test("urlGate stream: bit-exact batch parity across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val urls = Seq(
      (0L, "HTTPS://WWW.D1.example.com:443/p/0/?b=2&a=1&utm_source=s#f"),
      (1L, "https://d1.example.com/p/0?a=1&b=2"),
      (2L, "https://sub.blocked.org/x"),
      (3L, "junk"),
      (4L, "http://d2.example.com:80/q?gclid=g"))
    val blocked = Seq("blocked.org")
    val in = MemoryStream[(Long, String)]
    val sdf = graft.streaming.StreamingCuration.urlGate(
      in.toDF().toDF("doc_id", "url"), blocked)
    val q = sdf.writeStream.format("memory").queryName("url_gate_sink")
      .outputMode("append").start()
    try {
      in.addData(urls.take(2)); q.processAllAvailable()
      in.addData(urls.drop(2)); q.processAllAvailable()
      val got = spark.table("url_gate_sink")
        .select("doc_id", "url_norm", "domain", "blocked").collect().toSet
      val want = graft.streaming.StreamingCuration.urlGate(
          urls.toDF("doc_id", "url"), blocked)
        .select("doc_id", "url_norm", "domain", "blocked").collect().toSet
      assert(got === want)
      assert(got.size === 5)
    } finally q.stop()
  }
}
