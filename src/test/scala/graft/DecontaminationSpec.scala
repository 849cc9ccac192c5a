package graft

import org.apache.spark.sql.functions._

import graft.operators.{Decontamination, TextAnalysis}

/** Decontamination semantics on crafted corpora (planted overlap,
  * threshold, short docs, hash-parameterization agreement) plus the plan
  * contract that justifies the operator — the corpus probe side is
  * map-only: no shuffle of corpus rows, the single exchange belongs to
  * the tiny benchmark aggregation. The oracle rows (ext_decontaminate,
  * ext_decontaminate_prod) cross-check full outputs against DuckDB; this
  * spec pins edge semantics and the physical plan.
  *
  * Also pins TextAnalysis.repetition's arithmetic on hand-countable docs
  * (the ext_repetition oracle covers the corpus-wide values).
  */
class DecontaminationSpec extends SparkSpecBase {

  import spark.implicits._

  // 5 tokens -> exactly one 3-gram window per consecutive triple
  private lazy val benchmark = Seq(
    (100L, "alpha beta gamma delta epsilon"),
    (101L, "one two three four")).toDF("doc_id", "text")

  private lazy val corpus = Seq(
    (1L, "xx alpha beta gamma yy"),         // shares 1 gram: "alpha beta gamma"
    (2L, "beta gamma delta epsilon zz"),    // shares 2: "beta gamma delta", "gamma delta epsilon"
    (3L, "totally different words here ok"),// shares 0
    (4L, "one two"),                        // < n tokens: zero grams
    (5L, "one two three four")              // benchmark verbatim: shares 2
  ).toDF("doc_id", "text")

  private def run(minShared: Int, algo: String = "xxh64") =
    Decontamination.flag(corpus, benchmark, n = 3, minShared = minShared,
        algo = algo)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

  test("flags exactly the docs sharing >= minShared grams; short docs never") {
    val got = run(minShared = 1)
    assert(got(1L) === ((3L, 1L, true)))
    assert(got(2L) === ((3L, 2L, true)))
    assert(got(3L) === ((3L, 0L, false)))
    assert(got(4L) === ((0L, 0L, false))) // 2 tokens < n=3: no grams at all
    assert(got(5L) === ((2L, 2L, true)))  // verbatim benchmark doc
  }

  test("minShared sharpens the gate without changing the counts") {
    val got = run(minShared = 2)
    assert(got.view.mapValues(_._3).toMap ===
      Map(1L -> false, 2L -> true, 3L -> false, 4L -> false, 5L -> true))
    assert(got.view.mapValues(v => (v._1, v._2)).toMap ===
      run(minShared = 1).view.mapValues(v => (v._1, v._2)).toMap)
  }

  test("md5 and xxh64 parameterizations agree document-for-document") {
    assert(run(minShared = 1, algo = "md5") === run(minShared = 1))
  }

  test("reserved/output name collisions fail loud instead of clobbering") {
    val tainted = corpus.withColumn("contaminated", lit(true))
    val e = intercept[IllegalArgumentException] {
      Decontamination.annotate(tainted, benchmark, n = 3)
    }
    assert(e.getMessage.contains("contaminated"))
  }

  test("NULL text reads as the empty document: kept, zero grams, clean") {
    val withNull = corpus.unionByName(
      Seq((6L, Option.empty[String])).toDF("doc_id", "text"))
    val got = Decontamination.flag(withNull, benchmark, n = 3)
      .where(col("doc_id") === 6L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq === Seq((0L, 0L, false)))
  }

  test("empty benchmark: nothing is contaminated, counts intact") {
    val got = Decontamination.flag(corpus,
        benchmark.where(col("doc_id") < 0), n = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.size === 5)
    assert(got.values.forall(_ === ((0L, false))))
  }

  test("plan: corpus probe side is map-only — broadcast, no corpus shuffle") {
    val docs = Tables.documents(spark, sf0001)
    val q = Decontamination.flag(
      docs.where(col("doc_id") % 29 =!= 0),
      docs.where(col("doc_id") % 29 === 0), n = 5)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected the one-row broadcast build:\n$plan")
    // the benchmark agg reduces to a single row (Exchange SinglePartition);
    // corpus rows must reach the join straight from their scan
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus side must not shuffle:\n$plan")
  }

  test("streaming gate: same batch code on an unbounded frame, batch parity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    // caller-owned pack lifecycle: build + cache the benchmark grams once,
    // unpersist when the stream stops (the gate no longer caches
    // internally — repeated gate composition used to orphan cache entries)
    val pack = Decontamination.benchmarkGrams(benchmark, n = 3).cache()
    val q = graft.streaming.StreamingCuration
      .decontaminationGate(docs, pack)
      .writeStream.format("memory").queryName("decon_gate")
      .outputMode("append").start()
    try {
      in.addData((1L, "xx alpha beta gamma yy"), // contaminated -> dropped
        (3L, "totally different words here ok"))
      q.processAllAvailable()
      in.addData((4L, "one two"), // clean (too short for any gram)
        (5L, "one two three four")) // benchmark verbatim -> dropped
      q.processAllAvailable()
      val surviving = spark.table("decon_gate")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(surviving === Set(3L, 4L))
      // batch parity: the identical gate over the replayed corpus
      val batch = graft.operators.Decontamination
        .annotate(corpus.where(col("doc_id").isin(1L, 3L, 4L, 5L)),
          benchmark, n = 3)
        .filter(!col("contaminated"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(batch === surviving)
    } finally { q.stop(); pack.unpersist() }
  }

  test("pack/probe contract: a frame without the gram metadata is rejected") {
    val fake = benchmark.sparkSession.range(1)
      .select(array(lit(1L), lit(2L)).as("bench_hs"))
    val e = intercept[IllegalArgumentException] {
      Decontamination.annotateAgainst(corpus, fake)
    }
    assert(e.getMessage.contains("gram contract"))
    // and the real pack round-trips its contract: annotateAgainst re-derives
    // (n=3, md5) from metadata, so results match the one-shot form exactly
    val pack = Decontamination.benchmarkGrams(benchmark, n = 3, algo = "md5")
    val viaPack = Decontamination.annotateAgainst(corpus, pack)
      .select("doc_id", "n_shared").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val oneShot = Decontamination.annotate(corpus, benchmark, n = 3, algo = "md5")
      .select("doc_id", "n_shared").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaPack === oneShot)
  }

  // --- TextAnalysis.repetition ----------------------------------------

  test("repetition: duplicate-2-gram fraction on hand-countable docs") {
    val docs = Seq(
      (1L, "a b a b a"),   // 4 grams: "a b","b a","a b","b a" -> 2 distinct, frac 0.5
      (2L, "a b c d"),     // 3 grams, all distinct -> 0.0
      (3L, "x x x x x x"), // 5 grams, 1 distinct -> 0.8
      (4L, "solo")         // 0 grams -> 0.0, not repetitive
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(docs, n = 2)
      .collect().map(r => (r.getLong(0),
        (r.getInt(1), r.getInt(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(1L) === ((4, 2, 0.5, true)))
    assert(got(2L) === ((3, 3, 0.0, false)))
    assert(got(3L) === ((5, 1, 0.8, true)))
    assert(got(4L) === ((0, 0, 0.0, false)))
  }

  test("repetition gate is strict: exactly num/den does not trip") {
    // 10 grams, 9 distinct ("a b" twice) -> frac 1/10 == the default
    // 1/10 gate -> false
    val docs = Seq((1L, "a b c d e f g h i a b")).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(docs, n = 2).collect().head
    assert(r.getInt(1) === 10 && r.getInt(2) === 9)
    assert(!r.getBoolean(4))
  }

  // --- TextAnalysis.piiRedact ------------------------------------------

  test("piiRedact: counts per family, sequential redaction, boundaries, NULL text") {
    val docs = Seq(
      (1L, "reach me at jo.doe+x@sub.example.org or admin@example.com thanks"),
      (2L, "call +4915512345678 or 555-123-4567 today"),
      (3L, "server at 192.168.0.1 and 10.0.255.25 responded"),
      (4L, "short +123456 is under the 7-digit phone minimum"),
      (5L, "version 1.2.3 has three octets, not an IP"),
      (6L, null.asInstanceOf[String]),
      (7L, "mixed: bob@x.io from 127.0.0.1 dialing 800-555-1234")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiRedact(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) === ((2L, 0L, 0L,
      "reach me at [EMAIL] or [EMAIL] thanks")))
    assert(got(2L) === ((0L, 2L, 0L, "call [PHONE] or [PHONE] today")))
    assert(got(3L) === ((0L, 0L, 2L, "server at [IP] and [IP] responded")))
    assert(got(4L) === ((0L, 0L, 0L,
      "short +123456 is under the 7-digit phone minimum")))
    assert(got(5L) === ((0L, 0L, 0L,
      "version 1.2.3 has three octets, not an IP")))
    assert(got(6L) === ((0L, 0L, 0L, "")))
    assert(got(7L) === ((1L, 1L, 1L,
      "mixed: [EMAIL] from [IP] dialing [PHONE]")))
  }
}
