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
}
