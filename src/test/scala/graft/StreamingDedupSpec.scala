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

  test("streaming curation flow: gates + exact dedup match the batch composition on a replayed corpus; Hamming-ball probes pair near-dups across batches that exact bands cannot") {
    implicit val sq = spark.sqlContext
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    // 49-token base and a one-word edit: their xxh64 SimHash sketches
    // differ in exactly 4 bits spread (1,1,1,1) across the 4 bands — the
    // pigeonhole boundary case. NO band matches exactly (the plain band
    // join provably cannot pair them) while EVERY band is within Hamming
    // 1 (probeBits=16 provably must). A re-tokenization that shifts the
    // sketch re-picks the pair; the assertions below would fail loudly.
    val baseText = "the quick brown fox jumps over the lazy dog while the calm " +
      "river flows gently past the old stone bridge where children often play " +
      "during warm summer afternoons and the soft wind carries the sweet scent " +
      "of wild flowers across the quiet green valley toward the distant snowy mountains"
    val editText = baseText.replace("bridge where children", "bridge changed children")
    val lowQuality = "tiny doc"
    val german = "der hund und die katze laufen durch das haus und der wald"
    val corpus = Seq(
      (1L, baseText, ts("2025-01-05 10:00:00")),
      (2L, editText, ts("2025-01-05 10:01:00")), // near-dup of 1, passes gates
      (3L, unrelated, ts("2025-01-05 10:02:00")), // no en markers -> lang gate
      (4L, lowQuality, ts("2025-01-05 10:03:00")), // quality gate
      (5L, german, ts("2025-01-05 10:04:00")), // de -> lang gate
      (6L, baseText, ts("2025-01-05 10:05:00"))) // exact dup of 1 -> dedup
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = in.toDF().toDF("doc_id", "text", "ts")
    val curated = graft.streaming.StreamingCuration
      .curatedStream(docs, "ts", "1 hour")
    val q1 = curated.writeStream.format("memory").queryName("sc_curated")
      .outputMode("append").start()
    val q2 = graft.streaming.StreamingCuration
      .nearDupCandidates(spark, curated, n = 3, maxDist = 8) // probeBits=16 default
      .writeStream.format("memory").queryName("sc_cand")
      .outputMode("append").start()
    val q3 = graft.streaming.StreamingCuration
      .nearDupCandidates(spark, curated, n = 3, maxDist = 8, probeBits = 0)
      .writeStream.format("memory").queryName("sc_cand_plain")
      .outputMode("append").start()
    def syncAll(): Unit = {
      q1.processAllAvailable(); q2.processAllAvailable(); q3.processAllAvailable()
    }
    try {
      // replay in two micro-batches: the near-dup halves arrive in
      // DIFFERENT batches, so pairing must come from bucket state
      corpus.take(1).foreach(in.addData(_)); syncAll()
      corpus.drop(1).foreach(in.addData(_)); syncAll()
      val streamed = spark.table("sc_curated")
      assert(streamed.columns.contains("quality_score") &&
        streamed.columns.contains("lang_predicted"))
      val streamedIds = streamed.select("doc_id").collect().map(_.getLong(0)).toSet
      // batch parity: the SAME gate chain + keep-first exact dedup on the
      // full corpus as one batch frame (arrival order is doc_id order, so
      // streaming first-wins == batch min(doc_id))
      val batchIds = graft.operators.TextAnalysis
        .withCurationGates(corpus.toDF("doc_id", "text", "ts"))
        .filter(col("quality_score") > 0.5 && col("lang_predicted") === "en")
        .groupBy(xxhash64(col("text")), length(col("text")))
        .agg(min(col("doc_id")).as("doc_id"))
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(streamedIds === batchIds)
      assert(streamedIds === Set(1L, 2L)) // and the set is the curated one
      // probed: the (1,1,1,1) pair MUST surface (doc 1's bands are in
      // state from batch 1; doc 2's probe rows land in them in batch 2);
      // gated-out docs never reach the sketch stage, so no other pair can
      val cands = spark.table("sc_cand").as[CandidatePair].collect()
      assert(cands.map(p => (p.docA, p.docB)).toSet === Set((1L, 2L)))
      assert(cands.forall(_.hamming === 4))
      // plain exact bands: provably unreachable at spread (1,1,1,1)
      assert(spark.table("sc_cand_plain").count() === 0)
      // compaction closes the flow to the batch end state: keep-smallest
      // drops doc 2, leaving exactly the survivor set batch curation
      // (gates -> exact dedup -> near-dup removal) would produce
      val compacted = graft.streaming.StreamingCuration.keepSmallest(
        spark.table("sc_curated"), spark.table("sc_cand").as[CandidatePair])
      assert(compacted.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L))
    } finally {
      q1.stop(); q2.stop(); q3.stop()
      spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
    }
  }

  test("probed candidates pair within ONE micro-batch: exact rows enter state before any probe row looks") {
    implicit val sq = spark.sqlContext
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val in = MemoryStream[(Long, Long)]
    val bandedStream = StreamingDedup.banded(spark,
      in.toDF().toDF("doc_id", "simhash"), probeBits = 16)
    val q = StreamingDedup.candidatePairStream(spark, bandedStream, maxDist = 10)
      .writeStream.format("memory").queryName("sdd_samebatch")
      .outputMode("append").start()
    try {
      // the DedupSpec boundary pair: distance 4 spread (1,1,1,1) — NO
      // exact band matches, only probe lookups can pair them. Both docs
      // arrive in the SAME micro-batch; group-iterator order is
      // unspecified, so this passes only because exact rows are
      // processed (and inserted) before any probe row compares.
      val base = 0x0123456789abcdL
      val other = base ^ (1L << 0) ^ (1L << 16) ^ (1L << 32) ^ (1L << 48)
      in.addData((10L, base), (11L, other))
      q.processAllAvailable()
      val got = spark.table("sdd_samebatch").as[CandidatePair].collect()
        .map(p => (p.docA, p.docB)).toSet
      assert(got === Set((10L, 11L)))
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
    }
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

  test("indexProbeStream: stream probes a persisted index across batches with batch parity") {
    implicit val sq = spark.sqlContext
    // corpus: docs 1 and 3; incoming stream: 2 (near-dup of 1), 4 (new),
    // 5 (exact dup of 1) — split across two micro-batches
    val corpus = Seq((1L, nearDupA), (3L, unrelated)).toDF("doc_id", "text")
    val idxPath = s"/tmp/graft_test_minhash_idx_${System.nanoTime()}"
    graft.operators.Dedup.minhashIndex(corpus, n = 3, numPerm = 16)
      .write.parquet(idxPath)
    val idx = spark.read.parquet(idxPath).cache()
    try {
      val in = MemoryStream[(Long, String)]
      val docs = in.toDF().toDF("doc_id", "text")
      val q = StreamingDedup.indexProbeStream(docs, idx,
        rowsPerBand = 1, num = 1, den = 2)
        .writeStream.format("memory").queryName("sdd_probe")
        .outputMode("append").start()
      try {
        in.addData((2L, nearDupB), (4L, "some fresh words never seen in this corpus at all"))
        q.processAllAvailable()
        in.addData((5L, nearDupA))
        q.processAllAvailable()
        val got = spark.table("sdd_probe").collect()
          .map(r => (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_old"))).toSet
        val batch = graft.operators.Dedup.minhashPairsAgainst(
          Seq((2L, nearDupB), (4L, "some fresh words never seen in this corpus at all"),
            (5L, nearDupA)).toDF("doc_id", "text"),
          idx, rowsPerBand = 1, num = 1, den = 2)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got === batch)
        assert(got === Set((2L, 1L), (5L, 1L)))
      } finally q.stop()
    } finally idx.unpersist()
  }

  test("spanScrubRowwise on a stream: stateless scrub, bit-exact batch " +
      "parity across micro-batch boundaries") {
    implicit val sq = spark.sqlContext
    val rows = Seq((1L, "a b c X a b c"), (2L, "v w x y z v w x y z"),
      (3L, "clean text with no repeats at all"))
    val in = MemoryStream[(Long, String)]
    val q = graft.operators.Dedup.spanScrubRowwise(
      in.toDF().toDF("doc_id", "text"), n = 3)
      .writeStream.format("memory").queryName("sdd_scrub")
      .outputMode("append").start()
    try {
      in.addData(rows.take(1): _*); q.processAllAvailable()
      in.addData(rows.drop(1): _*); q.processAllAvailable()
      def snap(rs: Array[org.apache.spark.sql.Row]) = rs.map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      val streamed = snap(spark.table("sdd_scrub").collect())
      val batch = snap(graft.operators.Dedup.spanScrub(
        rows.toDF("doc_id", "text"), n = 3).collect())
      assert(streamed === batch)
      assert(streamed(1L)._3 === "a b c X a b")
    } finally q.stop()
  }

  test("bm25 serve on a stream: persisted stats artifact round-trips and " +
      "scores micro-batches bit-identically to batch") {
    implicit val sq = spark.sqlContext
    import graft.operators.TextAnalysis
    val corpus = Seq((101L, nearDupA), (102L, nearDupB), (103L, unrelated))
      .toDF("doc_id", "text")
    val terms = Seq("fox", "spark")
    val fitted = TextAnalysis.bm25Fit(corpus, terms)
    val statsPath = s"/tmp/graft_test_bm25_${System.nanoTime()}"
    TextAnalysis.bm25StatsToFrame(spark, fitted).write.parquet(statsPath)
    val reloaded = TextAnalysis.bm25StatsFromFrame(
      spark.read.parquet(statsPath))
    assert(reloaded === fitted) // artifact round-trip is lossless
    val incoming = Seq((1L, nearDupA), (2L, unrelated),
      (3L, "no match here at all"))
    val in = MemoryStream[(Long, String)]
    val q = TextAnalysis.bm25ScoreWith(in.toDF().toDF("doc_id", "text"),
        reloaded)
      .writeStream.format("memory").queryName("sdd_bm25")
      .outputMode("append").start()
    try {
      in.addData(incoming.take(1): _*); q.processAllAvailable()
      in.addData(incoming.drop(1): _*); q.processAllAvailable()
      def snap(rs: Array[org.apache.spark.sql.Row]) = rs.map(r =>
        r.getLong(0) -> r.getAs[Double]("score")).toMap
      val streamed = snap(spark.table("sdd_bm25").collect())
      val batch = snap(TextAnalysis.bm25ScoreWith(
        incoming.toDF("doc_id", "text"), reloaded).collect())
      assert(streamed === batch)
      assert(streamed(1L) > 0.0 && streamed(3L) === 0.0)
    } finally q.stop()
  }

  test("streaming perplexity gate: batch-parity scores and buckets from " +
      "persisted LM + threshold artifacts, across micro-batch boundaries") {
    implicit val sq = spark.sqlContext
    // reference corpus trains the LM and the tertile thresholds batch-side
    val reference = Seq(
      (101L, nearDupA), (102L, nearDupB), (103L, unrelated),
      (104L, "the quick brown fox sleeps under the lazy dog by the bank"))
      .toDF("doc_id", "text")
    val model = graft.operators.TextAnalysis.lmTrain(reference,
      vocabK = 20, lmK = 50)
    val thresholds = graft.operators.TextAnalysis.lmPerplexityThresholds(
      graft.operators.TextAnalysis.lmScore(reference, model)).cache()
    try {
      val incoming = Seq(
        (1L, nearDupA),                                   // in-domain: head-ish
        (2L, "fox jumps dog river the the the quick"),    // shuffled: worse LM fit
        (3L, "totally novel tokens outside any training vocabulary stream"),
        (4L, "single"))                                   // unscored
      val in = MemoryStream[(Long, String)]
      val docs = in.toDF().toDF("doc_id", "text")
      val q = graft.streaming.StreamingCuration.perplexityGate(
        docs, model, thresholds)
        .writeStream.format("memory").queryName("sc_ppl")
        .outputMode("append").start()
      try {
        in.addData(incoming.take(2): _*)
        q.processAllAvailable()
        in.addData(incoming.drop(2): _*)
        q.processAllAvailable()
        def snap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
          r.getLong(0) -> (r.getLong(1), Option(r.getAs[Any]("cost_sum")),
            r.getString(4))).toMap
        val streamed = snap(spark.table("sc_ppl").collect())
        // batch twin: SAME artifacts through the batch gate over the
        // batch scorer — bit-exact integers, identical buckets
        val batch = snap(graft.operators.TextAnalysis.lmPerplexityGateWith(
          graft.operators.TextAnalysis.lmScore(
            incoming.toDF("doc_id", "text"), model), thresholds).collect())
        assert(streamed === batch)
        // the gate actually discriminates: doc 4 unscored, and the
        // corpus spans more than one bucket
        assert(streamed(4L)._3 === "unscored")
        assert(streamed.values.map(_._3).toSet.size >= 2)
      } finally q.stop()
    } finally { thresholds.unpersist(); () }
  }

  test("streaming DSIR gate: batch-parity weights and selection from " +
      "persisted model + threshold artifacts") {
    implicit val sq = spark.sqlContext
    import graft.operators.TextAnalysis
    // batch side trains the importance model and the keep threshold
    val raw = Seq((101L, "aa bb cc dd"), (102L, "aa aa bb bb"),
      (103L, "xx yy zz ww"), (104L, "aa xx cc yy")).toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") <= 102L)
    val model = TextAnalysis.dsirTrain(raw, target, buckets = 8,
      seed = "sdsir", algo = "md5")
    val thr = TextAnalysis.dsirThreshold(
      TextAnalysis.dsirLogWeights(raw, model), keepFraction = 0.5).cache()
    try {
      val incoming = Seq((1L, "aa bb aa bb"), (2L, "xx yy zz ww"),
        (3L, null.asInstanceOf[String]))
      val in = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingCuration.dsirGate(
        in.toDF().toDF("doc_id", "text"), model, thr)
        .writeStream.format("memory").queryName("sc_dsir")
        .outputMode("append").start()
      try {
        in.addData(incoming.take(1): _*); q.processAllAvailable()
        in.addData(incoming.drop(1): _*); q.processAllAvailable()
        def snap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
          r.getLong(0) -> (r.getLong(1), Option(r.getAs[Any]("logw_micro")),
            r.getBoolean(3))).toMap
        val streamed = snap(spark.table("sc_dsir").collect())
        val batch = snap(TextAnalysis.dsirGateWith(
          TextAnalysis.dsirLogWeights(incoming.toDF("doc_id", "text"),
            model), thr).collect())
        assert(streamed === batch)
        // gate discriminates: target-like doc kept, off-domain dropped,
        // null text unscored and never selected
        assert(streamed(1L)._3)
        assert(!streamed(2L)._3)
        assert(streamed(3L)._2.isEmpty && !streamed(3L)._3)
      } finally q.stop()
    } finally { thr.unpersist(); () }
  }

  test("streaming alignment gate: bit-exact batch parity for the decoded " +
    "quadrant profiles and verdicts across micro-batch boundaries") {
    import graft.operators.Multimodal
    implicit val sq = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf0001).limit(40)
    val media = Multimodal.synthesizeCaptionedImages(spark, docs)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1),
        r.getString(2)))
    val in = MemoryStream[(Long, Array[Byte], String)]
    val stream = in.toDF().toDF("doc_id", "payload", "caption")
    val q = graft.streaming.StreamingCuration
      .alignmentGate(spark, stream)
      .writeStream.format("memory").queryName("align_t")
      .outputMode("append").start()
    try {
      val (b1, b2) = media.splitAt(media.length / 2)
      in.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      in.addData(b2.toIndexedSeq)
      q.processAllAvailable()
      def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("q0"), r.getAs[Long]("c0"),
            r.getAs[Long]("dot"), r.getAs[Boolean]("aligned")))).toMap
      val streamed = snap(spark.table("align_t"))
      val batch = snap(Multimodal.alignmentGate(spark,
        Multimodal.synthesizeCaptionedImages(spark, docs)))
      assert(streamed === batch)
      assert(streamed.size === 40)
    } finally q.stop()
  }

  test("streaming budget gate: per-source greedy prefix matches batch " +
    "selectWithinBudget across micro-batch boundaries, no backfill") {
    import graft.streaming.StreamingCuration
    import graft.streaming.StreamingCuration.{BudgetDoc, BudgetVerdict}
    implicit val sq = spark.sqlContext
    val in = MemoryStream[BudgetDoc]
    val q = StreamingCuration.budgetGate(spark, in.toDS(), budget = 100L)
      .writeStream.format("memory").queryName("budget_t")
      .outputMode("append").start()
    try {
      // batch 1: source a consumes 70 of 100; source b consumes 90
      in.addData(
        BudgetDoc("a", 1L, 40L), BudgetDoc("a", 2L, 30L),
        BudgetDoc("b", 1L, 90L))
      q.processAllAvailable()
      // batch 2: a's third doc crosses (70+50=120 > 100) and is rejected;
      // the SMALLER fourth doc (20 — would fit 70+20=90) is ALSO rejected:
      // greedy prefix, no backfill. b's second doc fits exactly (90+10).
      in.addData(
        BudgetDoc("a", 3L, 50L), BudgetDoc("a", 4L, 20L),
        BudgetDoc("b", 2L, 10L))
      q.processAllAvailable()
      val streamed = spark.table("budget_t").collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")) ->
          ((r.getAs[Long]("cum_weight"), r.getAs[Boolean]("selected")))).toMap
      assert(streamed(("a", 1L)) === ((40L, true)))
      assert(streamed(("a", 2L)) === ((70L, true)))
      assert(streamed(("a", 3L)) === ((120L, false))) // crossed mid-stream
      assert(streamed(("a", 4L)) === ((140L, false))) // no backfill
      assert(streamed(("b", 1L)) === ((90L, true)))
      assert(streamed(("b", 2L)) === ((100L, true))) // exact fit admits

      // batch parity: selectWithinBudget in arrival order per source
      // (priority constant → order falls to id) yields the same verdicts
      val all = Seq(("a", 1L, 40L), ("a", 2L, 30L), ("a", 3L, 50L),
        ("a", 4L, 20L), ("b", 1L, 90L), ("b", 2L, 10L))
      for (src <- Seq("a", "b")) {
        val df = all.filter(_._1 == src).toDF("source", "doc_id", "weight")
        val batch = graft.operators.Sampling
          .selectWithinBudget(df, lit(0), col("weight"), col("doc_id"), 100L)
          .collect()
          .map(r => r.getAs[Long]("doc_id") ->
            ((r.getAs[Long]("cum_weight"), r.getAs[Boolean]("selected"))))
          .toMap
        for ((id, v) <- batch) assert(streamed((src, id)) === v)
      }

      // a third batch after exhaustion stays rejected (state persisted)
      in.addData(BudgetDoc("a", 5L, 1L))
      q.processAllAvailable()
      assert(spark.table("budget_t").collect()
        .find(r => r.getAs[String]("source") == "a" && r.getAs[Long]("doc_id") == 5L)
        .exists(!_.getAs[Boolean]("selected")))
    } finally q.stop()
  }

  test("budget gate: a later batch delivering a SMALLER doc_id fails " +
    "loud — the arrival-monotone contract is checked, not assumed") {
    import graft.streaming.StreamingCuration
    import graft.streaming.StreamingCuration.BudgetDoc
    implicit val sq = spark.sqlContext
    val in = MemoryStream[BudgetDoc]
    val q = StreamingCuration.budgetGate(spark, in.toDS(), budget = 100L)
      .writeStream.format("memory").queryName("budget_mono_t")
      .outputMode("append").start()
    try {
      in.addData(BudgetDoc("a", 10L, 5L))
      q.processAllAvailable()
      // doc 7 < high-water mark 10: silently charging it AFTER doc 10
      // would diverge from the batch operator's admission order
      in.addData(BudgetDoc("a", 7L, 5L))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => Option(x.getMessage).getOrElse("")).toSeq
      assert(chain(e).exists(_.contains("arrival-monotone")))
    } finally q.stop()
  }
}
