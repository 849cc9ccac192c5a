package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.operators.TextAnalysis.GopherParams

/** Gopher rule gate (`ext_gopher_rules{,_rowwise}`): hand frames drive
  * every rule through BOTH verdicts (the corpus oracle can't fail the
  * alpha/symbol rules — this spec owns that branch coverage), the
  * relational and rowwise siblings are pinned bit-identical on real
  * corpus data, and null text surfaces as NULL verdicts + a false pass.
  */
class GopherRulesSpec extends SparkSpecBase {

  // Small thresholds so each hand doc isolates one rule.
  // minAlphaPerMille 700 (not 800): a symbol word is never alphabetic,
  // so the symbol-rule doc (1 of 4 tokens) must stay above the alpha
  // floor — 750‰ ≥ 700‰ — for the two rules to be isolatable at all.
  private val p = GopherParams(
    minTokens = 3L, maxTokens = 6L,
    minMeanLenMilli = 2000L, maxMeanLenMilli = 5000L,
    minAlphaPerMille = 700L, maxSymbolPerMille = 200L,
    minStopwords = 1L, maxTopTokenPerMille = 500L,
    stopwords = Seq("the"), symbols = Seq("#"))

  private def handDocs = {
    import spark.implicits._
    Seq(
      (0L, "the cat sat mat"),        // passes every rule
      (1L, "the be"),                 // word count 2 < 3
      (2L, "the elephantine gigantesque wanderlust"), // mean len 8.75 > 5
      (3L, "12 34 56 the"),           // alpha 250‰ < 700‰ (mean len 2.25 ok)
      (4L, "the # cat sat"),          // symbols 250‰ > 200‰ (alpha 750 ok)
      (5L, "cat dog bird fish"),      // zero stopwords
      (6L, "cat cat cat the"),        // top token 750‰ > 500‰
      (7L, null.asInstanceOf[String]) // unscoreable
    ).toDF("doc_id", "text")
  }

  private val ruleCols = Seq("r_word_count", "r_mean_word_len", "r_alpha",
    "r_symbol", "r_stopwords", "r_top_token")

  private def byId(df: org.apache.spark.sql.DataFrame): Map[Long, Row] =
    df.collect().map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap

  private def checkHand(rows: Map[Long, Row]): Unit = {
    // doc 0: all six rules true, pass true
    val r0 = rows(0L)
    ruleCols.foreach(c => assert(r0.getBoolean(r0.fieldIndex(c)), c))
    assert(r0.getBoolean(r0.fieldIndex("gopher_pass")))
    // docs 1..6 each fail exactly the targeted rule
    val expectFail = Map(1L -> "r_word_count", 2L -> "r_mean_word_len",
      3L -> "r_alpha", 4L -> "r_symbol", 5L -> "r_stopwords",
      6L -> "r_top_token")
    expectFail.foreach { case (id, failing) =>
      val r = rows(id)
      assert(!r.getBoolean(r.fieldIndex(failing)), s"doc $id $failing")
      assert(!r.getBoolean(r.fieldIndex("gopher_pass")), s"doc $id pass")
      // the targeted rule is the ONLY failing one — rule isolation
      ruleCols.filterNot(_ == failing).foreach { c =>
        assert(r.getBoolean(r.fieldIndex(c)), s"doc $id $c")
      }
    }
    // doc 7 (null text): NULL verdicts, false pass
    val r7 = rows(7L)
    ruleCols.foreach(c => assert(r7.isNullAt(r7.fieldIndex(c)), c))
    assert(r7.isNullAt(r7.fieldIndex("n_tokens")))
    assert(!r7.getBoolean(r7.fieldIndex("gopher_pass")))
  }

  test("relational sibling: every rule realizes both verdicts") {
    checkHand(byId(TextAnalysis.gopherRules(handDocs, p)))
  }

  test("rowwise sibling: identical verdicts on the hand frame") {
    checkHand(byId(TextAnalysis.gopherRulesRowwise(handDocs, p)))
  }

  test("rowwise == relational bit-for-bit on real corpus") {
    val docs = Tables.documents(spark, sf0001)
    val cp = GopherParams(
      minTokens = 50L, maxTokens = 100000L,
      minMeanLenMilli = 4200L, maxMeanLenMilli = 10000L,
      minAlphaPerMille = 800L, maxSymbolPerMille = 100L,
      minStopwords = 2L, maxTopTokenPerMille = 125L,
      stopwords = Seq("the", "a", "of", "fast", "slow", "be", "and", "with"))
    val rel = byId(TextAnalysis.gopherRules(docs, cp))
    val row = byId(TextAnalysis.gopherRulesRowwise(docs, cp))
    assert(rel.keySet === row.keySet)
    assert(rel.nonEmpty)
    rel.foreach { case (id, r) => assert(r === row(id), s"doc $id") }
    // the corpus realizes both pass verdicts (thresholds discriminate)
    val passes = rel.values.count(r =>
      r.getBoolean(r.fieldIndex("gopher_pass")))
    assert(passes > 0 && passes < rel.size)
  }
}
