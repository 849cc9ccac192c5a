package graft

import graft.operators.TextAnalysis

/** Differentials the distributed BPE trainer against an independent
  * naive in-memory implementation: same merge table, same final
  * segmentation, same early stop. */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  /** Reference trainer: textbook BPE over a word-count map. Counts
    * overlapping adjacent pairs, argmax by (count desc, a, b), greedy
    * left-to-right merge. */
  private def naiveBpe(words: Map[String, Long],
                       nMerges: Int): (List[(String, String, Long)], Map[List[String], Long]) = {
    var vocab: Map[List[String], Long] =
      words.map { case (w, n) => w.map(_.toString).toList -> n }
    var merges = List.empty[(String, String, Long)]
    var round = 0
    var dry = false
    while (round < nMerges && !dry) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- vocab; Seq(a, b) <- syms.sliding(2) if syms.length >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + n
      if (counts.isEmpty) dry = true
      else {
        val ((a, b), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges = merges :+ ((a, b, cnt))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          syms.foldLeft(List.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b)
              acc.init :+ (a + b)
            else acc :+ x
          }
        } { case (_, n) => n } (_ + _)
        round += 1
      }
    }
    (merges, vocab)
  }

  private def trainBoth(texts: Seq[String], nMerges: Int) = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (merges, vocabDf) = TextAnalysis.bpeTrain(docs, nMerges)
    val words = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val (refMerges, refVocab) = naiveBpe(words, nMerges)
    val gotVocab = vocabDf.collect()
      .map(r => r.getSeq[String](0).toList -> r.getLong(1)).toMap
    (merges.toList, refMerges, gotVocab, refVocab)
  }

  test("merge table and final segmentation match the naive trainer (ties included)") {
    // "abab" repeats force overlapping-pair counting; "aaa" exercises the
    // greedy left-to-right fold; distinct counts force real ordering
    val texts = Seq(
      "abab abab aaa low lower lowest",
      "abab low low newer newest aaa",
      "wider new newer aaa abab")
    val (got, ref, gotVocab, refVocab) = trainBoth(texts, nMerges = 8)
    assert(got === ref)
    assert(gotVocab === refVocab)
  }

  test("early stop: training past full merging halts instead of looping") {
    val (got, ref, gotVocab, refVocab) = trainBoth(Seq("ab ab", "ab"), nMerges = 50)
    assert(got === ref)
    assert(got.length === 1) // one merge collapses the whole vocab
    assert(gotVocab === refVocab)
    assert(gotVocab.keySet === Set(List("ab")))
  }

  test("batched rounds: adversarial tie where naive tied-batching would diverge") {
    // Pairs (a,z), (b,b), (z,y) all tie at count 3. Sequentially, merging
    // (a,z) creates ("az", y) at count 3, which sorts BEFORE (b,b) — so a
    // batcher that naively emitted the disjoint tied prefix
    // [(a,z), (b,b)] would diverge. Condition (b) must shrink the batch
    // to (a,z) alone because (z,y) ∈ T shares 'z' with it.
    val texts = Seq("azy azy azy bb bb bb")
    val (got, ref, gotVocab, refVocab) = trainBoth(texts, nMerges = 4)
    assert(got === ref)
    assert(ref.take(2).map(m => (m._1, m._2)) === List(("a", "z"), ("az", "y")))
    assert(gotVocab === refVocab)
  }

  test("batched rounds: disjoint tied pairs merge in one distributed round, table unchanged") {
    val texts = Seq("ab ab ab ab ab cd cd cd cd cd ef ef ef ef ef gh gh gh gh gh")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (merges, _, rounds) = TextAnalysis.bpeTrainBatched(docs, nMerges = 4)
    val words = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val (refMerges, _) = naiveBpe(words, nMerges = 4)
    assert(merges.toList === refMerges)
    assert(merges.length === 4)
    assert(rounds === 1, s"4 disjoint tied merges should take 1 round, took $rounds")
  }

  test("batched trainer table == sequential distributed trainer on the sf0.001 corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (seq, _) = TextAnalysis.bpeTrainSequential(docs, nMerges = 12)
    val (bat, _, rounds) = TextAnalysis.bpeTrainBatched(docs, nMerges = 12)
    assert(bat.toList === seq.toList)
    assert(rounds <= 12)
  }

  /** Reference encoder: replay merges greedily left-to-right per word. */
  private def naiveEncode(text: String,
                          merges: Seq[(String, String)]): List[String] =
    text.split(" ").filter(_.nonEmpty).toList.flatMap { w =>
      merges.foldLeft(w.map(_.toString).toList) { case (syms, (a, b)) =>
        syms.foldLeft(List.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
          else acc :+ x
        }
      }
    }

  test("bpeEncode: per-doc token stream matches the naive encoder; training corpus reproduces trained vocab; empty doc keeps a row") {
    val texts = Seq(
      "abab abab aaa low lower lowest",
      "abab low low newer newest aaa",
      "",
      "wider new newer aaa abab")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (trained, _) = TextAnalysis.bpeTrain(docs, nMerges = 8)
    val merges = trained.map(m => (m._1, m._2))
    val got = TextAnalysis.bpeEncode(docs, merges)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[String](1).toList, r.getLong(2))).toMap
    assert(got.size === texts.length) // empty doc did not vanish
    texts.zipWithIndex.foreach { case (t, i) =>
      val ref = naiveEncode(t, merges)
      assert(got(i.toLong)._1 === ref, s"doc $i")
      assert(got(i.toLong)._2 === ref.length.toLong)
    }
    // unseen words at serve time: encodable with the same merges
    val fresh = Seq((9L, "lowest ababab unseen")).toDF("doc_id", "text")
    val enc = TextAnalysis.bpeEncode(fresh, merges)
      .collect().head.getSeq[String](1).toList
    assert(enc === naiveEncode("lowest ababab unseen", merges))
  }
}
