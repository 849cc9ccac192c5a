package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Hand-checked semantics for the chunking and bigram-coverage operators
  * (their values are also oracle-checked end-to-end by ext_chunk_overlap
  * and ext_bigram_coverage): offset arithmetic at the boundaries, the
  * empty/short-document conventions, and the vocab tie-break totality.
  */
class TextAnalysisSpec extends SparkSpecBase {

  import spark.implicits._

  test("chunkWithOverlap: boundaries, short and empty docs, offsets map back into the source") {
    // chunkSize 10, overlap 4 -> stride 6
    val docs = Seq(
      (1L, "abcdefghijklmnop"),  // 16 chars -> chunks at 1..10, 7..16
      (2L, "abcdefghij"),        // exactly chunkSize -> one chunk
      (3L, "abc"),               // shorter -> one short chunk
      (4L, ""),                  // empty -> ONE empty chunk, never vanishes
      (5L, "abcdefghijk"))       // 11 chars -> 1..10, 7..11 (short tail)
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkWithOverlap(docs, chunkSize = 10, overlap = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).sorted.toSeq
    assert(out === Seq(
      (1L, 0L, 1L, 10L, "abcdefghij"),
      (1L, 1L, 7L, 16L, "ghijklmnop"),
      (2L, 0L, 1L, 10L, "abcdefghij"),
      (3L, 0L, 1L, 3L, "abc"),
      (4L, 0L, 1L, 0L, ""),
      (5L, 0L, 1L, 10L, "abcdefghij"),
      (5L, 1L, 7L, 11L, "ghijk")))
    // every chunk is literally the substring its offsets claim
    out.filter(_._5.nonEmpty).foreach { case (id, _, s, e, chunk) =>
      val text = docs.filter(col("doc_id") === id).head.getString(1)
      assert(text.substring(s.toInt - 1, e.toInt) === chunk)
    }
    // parameter guards
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkWithOverlap(docs, chunkSize = 10, overlap = 10)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkWithOverlap(docs, chunkSize = 0, overlap = 0)
    }
  }

  test("bigramVocab + bigramCoverage: counts exact, tie-break total, short docs score 0/0") {
    val ref = Seq(
      (1L, "a b a b c"),   // bigrams: "a b"×2, "b a", "b c"
      (2L, "a b x y"))     // "a b", "b x", "x y"
      .toDF("doc_id", "text")
    val vocab = TextAnalysis.bigramVocab(ref, topK = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sorted
    // "a b" count 3; then the count-1 bigrams tie-break lexicographically:
    // "b a" wins over "b c", "b x", "x y"
    assert(vocab === Seq("a b" -> 3L, "b a" -> 1L))
    val docs = Seq(
      (10L, "a b c"),   // bigrams "a b"(hit), "b c"(miss) -> 1/2
      (11L, "z"),       // < 2 tokens -> 0 bigrams, coverage 0.0
      (12L, "a b a b")) // "a b","b a","a b" -> 3 hits / 3
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramCoverage(docs,
        TextAnalysis.bigramVocab(ref, topK = 2))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out === Map(
      10L -> ((2L, 1L, 0.5)),
      11L -> ((0L, 0L, 0.0)),
      12L -> ((3L, 3L, 1.0))))
  }

  test("collocations: hand-counted PMI ratios, inclusive integer gate, pair floor, null text") {
    // d1 "a b a b": tokens a,b,a,b ; bigrams (a,b)×2 (b,a)×1
    // d2 "c c": bigram (c,c)×1 → N_tok = 6, N_bi = 4
    val docs = Seq((1L, "a b a b"), (2L, "c c"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, minPairCount = 1L,
      thresholdMilli = 4500L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getDouble(7), r.getBoolean(8)))).toMap
    // score(a,b) = 2·6²/(4·2·2) = 4.5 — lands EXACTLY on the 4.5 gate:
    // the ≥ cross-multiply must include it (72000 vs 72000)
    assert(out(("a", "b")) === ((2L, 2L, 2L, 6L, 4L, 4.5, true)))
    // score(b,a) = 1·36/(4·2·2) = 2.25 < 4.5 → false, same counts
    assert(out(("b", "a")) === ((1L, 2L, 2L, 6L, 4L, 2.25, false)))
    assert(out(("c", "c")) === ((1L, 2L, 2L, 6L, 4L, 2.25, false)))
    assert(out.size === 3) // null text contributes nothing
    // the pair floor drops hapax pairs before scoring
    val floored = TextAnalysis.collocations(docs, minPairCount = 2L,
      thresholdMilli = 1000L).collect()
    assert(floored.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("a", "b")))
    intercept[IllegalArgumentException] {
      TextAnalysis.collocations(docs, 0L, 1000L)
    }
  }

  test("keywordSearch: integer TF×rarity scoring, rarity dominates tf, tiebreak, k cap") {
    // 4 docs; "rare" appears in d1 only (df=1 → w = 4e6);
    // "common" in all four (df=4 → w = 1e6)
    val docs = Seq(
      (1L, "rare common x"),
      (2L, "common common common x"), // tf=3 on the common term
      (3L, "common x y"),
      (4L, "common y z")).toDF("doc_id", "text")
    val out = TextAnalysis.keywordSearch(docs, Seq("rare", "common"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // d1: 1·4e6 + 1·1e6 = 5e6 beats d2's 3·1e6 — rarity outranks raw tf
    assert(out.toSeq === Seq(
      (1L, 5000000L, 1L),
      (2L, 3000000L, 2L),
      (3L, 1000000L, 3L))) // d4 ties d3 at 1e6 → doc_id breaks; k caps at 3
  }

  test("ext_hybrid_rrf: fused ranking is consistent with its own per-ranker columns") {
    val rows = graft.queries.ExtensionQueries.defs("ext_hybrid_rrf")
      .fn(spark, sf0001)
      .collect().map(r => (r.getLong(0), Option(r.getAs[Any]("lex_rank")),
        Option(r.getAs[Any]("sem_rank")), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // every row's quantized RRF score re-derives from its rank columns
    rows.foreach { case (_, lex, sem, rrfQ, _) =>
      val exp = lex.map(x => 1000000000000L / (60L + x.asInstanceOf[Long]))
        .getOrElse(0L) +
        sem.map(x => 1000000000000L / (60L + x.asInstanceOf[Long]))
          .getOrElse(0L)
      assert(rrfQ === exp)
    }
    // the final rank is the dense total order (rrf_q DESC, doc_id)
    val sorted = rows.sortBy { case (id, _, _, q, _) => (-q, id) }
    assert(sorted.map(_._5).toSeq === (1L to rows.length).toSeq)
    // both rankers contributed, and at least one doc carries both ranks
    // at sf0.001 OR the fused set is exactly the disjoint union
    assert(rows.exists(_._2.isDefined) && rows.exists(_._3.isDefined))
  }

  test("bigram LM: hand-checked counts and exact quantized surprisal chain") {
    val docs = Seq(
      (1L, "a b a b a"),  // pairs (a,b)(b,a)(a,b)(b,a)
      (2L, "a a b"),      // pairs (a,a)(a,b)
      (3L, "c"))          // single token -> unscored
      .toDF("doc_id", "text")
    val model = TextAnalysis.lmTrain(docs, vocabK = 2, lmK = 10)
    assert(model.alphabetSize === 3)
    assert(model.vocab.toSet === Set("a", "b"))  // c falls to <unk>
    assert(model.contexts.toMap === Map("a" -> 4L, "b" -> 2L))
    assert(model.bigrams.map(t => ((t._1, t._2), t._3)).toMap ===
      Map(("a", "b") -> 3L, ("b", "a") -> 2L, ("a", "a") -> 1L))
    val scored = TextAnalysis.lmScore(docs, model).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.getAs[Any]("cost_sum")))).toMap
    // hand-derived micro-nat costs (ladder + mantissa table):
    //   (a,b): r=7000/4=1750, e=0 -> q(1750)=559616
    //   (b,a): r=5000/3=1666, e=0 -> q(1666)=510426
    //   (a,a): r=7000/2=3500, e=1, m=1750 -> 693147+559616=1252763
    assert(scored(1L) === ((4L, Some(2L * 559616 + 2L * 510426))))
    assert(scored(2L) === ((2L, Some(1252763L + 559616L))))
    assert(scored(3L) === ((0L, None)))
  }

  test("bm25Search: agrees with an independent float BM25 within the " +
      "quantization band; idf and length normalization behave") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x y"),                  // rare term x twice, short
      (2L, "y z"),                    // common z once, shortest
      (3L, "z z z z"),                // common z, high tf, longer
      (4L, "x y y y y y y y y y y"),  // rare x once, LONG (dl penalty)
      (5L, "y y y"),                  // no query terms -> filtered out
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val terms = Seq("x", "z")
    val out = TextAnalysis.bm25Search(docs, terms, k = 10).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dl"), r.getAs[Long]("tf_0"), r.getAs[Long]("tf_1"),
          r.getAs[Double]("score"))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L)) // 5 has no terms, 6 null
    assert(out(1L)._1 === 3L && out(1L)._2 === 2L && out(1L)._3 === 0L)
    // independent float BM25 (k1=1.2, b=0.75, N=5 scored docs, T=23)
    val n = 5.0; val t = 23.0; val avgdl = t / n
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def s(tf: Double, dl: Double, df: Double) =
      if (tf == 0) 0.0
      else idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def expected(tfx: Double, tfz: Double, dl: Double) =
      s(tfx, dl, 2.0) + s(tfz, dl, 2.0)
    for ((id, (dl, tfx, tfz, score)) <- out) {
      val e = expected(tfx.toDouble, tfz.toDouble, dl.toDouble)
      // idf quantization error < 0.0022 nats per term, scaled by the
      // tf factor (< 2.2): band 0.005 absolute on micro-scaled scores
      assert(math.abs(score / 1e6 - e) < 0.005,
        s"doc $id: quantized ${score / 1e6} vs float $e")
    }
    // df_x = df_z = 2 here, so idf is equal and the ranking isolates
    // the tf side: saturation (doc3 tf=4 > doc2 tf=1, same term) and
    // length normalization (doc1 tf=2 dl=3 ≫ doc4 tf=1 dl=11). Full
    // order: 3 > 1 > 2 > 4.
    assert(out(3L)._4 > out(2L)._4 && out(1L)._4 > out(4L)._4)
    assert(out.toSeq.sortBy(-_._2._4).map(_._1) === Seq(3L, 1L, 2L, 4L))
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25Search(docs, Seq.empty, 5)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25Search(docs, Seq("x", "x"), 5)
    }
    ()
  }

  test("bigram LM rowwise scorer: bit-identical to the explode+join " +
      "scorer, including unscored and <unk>-heavy documents") {
    import spark.implicits._
    // hand frame exercises every lookup level: known bigram, known
    // context + unknown bigram, unknown context, single-token (unscored),
    // null text (unscored)
    val hand = Seq((1L, "a b a b a"), (2L, "a a b"), (3L, "c"),
      (4L, "z q z"), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val handModel = TextAnalysis.lmTrain(hand.filter("doc_id <= 2"),
      vocabK = 2, lmK = 2) // lmK cut forces the context-fallback path
    def snap(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), Option(r.getAs[Any]("cost_sum")),
        Option(r.getAs[Any]("avg_surprisal_micro")))).toMap
    assert(snap(TextAnalysis.lmScoreRowwise(hand, handModel)) ===
      snap(TextAnalysis.lmScore(hand, handModel)))

    // corpus-scale agreement on real documents
    val docs = graft.Tables.documents(spark, sf0001)
    val model = TextAnalysis.lmTrain(
      graft.operators.Sampling.sample(docs, col("doc_id"), 0.3, "r11rw"),
      vocabK = 100, lmK = 300)
    assert(snap(TextAnalysis.lmScoreRowwise(docs, model)) ===
      snap(TextAnalysis.lmScore(docs, model)))
  }

  test("bigram LM: exact tertiles are balanced; threshold gate agrees " +
      "within the sketch boundary") {
    val docs = graft.Tables.documents(spark, sf0001)
    val model = TextAnalysis.lmTrain(
      graft.operators.Sampling.sample(docs, col("doc_id"), 0.3, "r11lm"),
      vocabK = 100, lmK = 300)
    val scored = TextAnalysis.lmScore(docs, model).cache()
    val exact = TextAnalysis.lmPerplexityBuckets(scored)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    // tertile balance over the scored docs: each bucket within 1 of n/3
    val scoredBuckets = exact.values.filter(_ != "unscored").toSeq
    val n = scoredBuckets.size
    assert(n > 0)
    Seq("head", "middle", "tail").foreach { b =>
      assert(math.abs(scoredBuckets.count(_ == b) - n / 3.0) <= 1.0,
        s"bucket $b unbalanced")
    }
    val gated = TextAnalysis.lmPerplexityGateWith(scored,
        TextAnalysis.lmPerplexityThresholds(scored))
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    // unscored sets identical; bucket agreement within the sketch's
    // rank-error band (boundary docs may swap adjacent buckets)
    assert(exact.keySet === gated.keySet)
    assert(exact.filter(_._2 == "unscored") ===
      gated.filter(_._2 == "unscored"))
    val agree = exact.count { case (id, b) => gated(id) == b }
    assert(agree >= math.ceil(exact.size * 0.9),
      s"agreement $agree/${exact.size} below 0.9")
    scored.unpersist()
    ()
  }

  test("round-15 degenerate-input hardening: empty/null docs never crash " +
    "or vanish — textStats NULL ratios, chunkWithOverlap empty-doc " +
    "convention for null text, bm25 serve keeps null-text rows at 0") {
    import spark.implicits._
    // textStats: an empty doc previously threw DIVIDE_BY_ZERO under ANSI
    val stats = TextAnalysis.textStats(
      Seq((1L, "a b a."), (2L, ""), (3L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    assert(stats.length === 3)
    assert(stats(1).getAs[Any]("punct_ratio") == null)
    assert(stats(0).getAs[Double]("punct_ratio") > 0.0)
    // chunkWithOverlap: null text = empty document, no fabricated span
    val chunks = TextAnalysis.chunkWithOverlap(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      chunkSize = 10, overlap = 4).collect()
    assert(chunks.length === 1)
    assert(chunks.head.getAs[Long]("end") === 0L) // empty span, not [1,10]
    assert(chunks.head.getAs[String]("chunk") === "")
    // bm25 serve: the null-text doc is KEPT with score exactly 0
    val docs = Seq((1L, "the market fell"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val st = TextAnalysis.bm25Fit(docs, Seq("market"))
    val scored = TextAnalysis.bm25ScoreWith(docs, st)
      .orderBy("doc_id").collect()
    assert(scored.length === 2, "null-text doc must not vanish from serve")
    assert(scored(1).getAs[Double]("score") === 0.0)
    assert(scored(0).getAs[Double]("score") > 0.0)
  }
}
