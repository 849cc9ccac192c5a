package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}

import org.apache.spark.unsafe.types.UTF8String

/** The complete row-wise repeated-span scrub fused into one native pass —
  * the whole [[graft.operators.Dedup.spanScrubRowwise]] policy (string-
  * equality n-grams, first occurrence survives, a token is removed iff
  * EVERY covering gram repeats an earlier same-doc gram) evaluated as a
  * single expression over the token array, returning
  * struct(n_tokens, n_removed, text_clean).
  *
  * Why native (the [[WordNGramHashes]] rationale, measured harder): the
  * HOF form paid an interpreted `array_position` linear scan per gram —
  * O(G²) string compares per document plus lambda dispatch — and at
  * sf0.1 was the suite's single slowest row at 30.3 s, 6× the runner-up.
  * This pass builds each gram once (O(G·n) bytes), detects repeats with
  * one hash map (O(G)), turns coverage into a prefix-sum window (O(m)),
  * and assembles the surviving text in place. Policy is UNCHANGED and
  * held by three independent pins: the hand-case spec, the rowwise ≡
  * relational corpus spec, and the shared DuckDB oracle row.
  *
  * CodegenFallback: one interpreted call per row into a tight loop (the
  * established trade for these fused passes).
  */
case class SpanScrubRow(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_span_scrub"

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false),
    StructField("text_clean", StringType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n >= 2 && n <= 64 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> and n in [2, 64], got " +
            s"${other.catalogString} / n=$n")
    }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val tokens = new Array[UTF8String](m)
    var i = 0
    while (i < m) { tokens(i) = arr.getUTF8String(i); i += 1 }
    val g = n - 1
    val nGrams = m - g
    val removed =
      if (nGrams <= 0) new Array[Boolean](m) // sub-n doc: nothing covered
      else {
        // dup(i): gram i (0-based, covering tokens i..i+g) equals an
        // earlier gram — first occurrence is NOT a dup.
        val seen = new java.util.HashMap[UTF8String, Integer](nGrams * 2)
        val parts = new Array[UTF8String](n)
        // prefix(i) = count of NON-dup grams among grams [0, i)
        val prefix = new Array[Int](nGrams + 1)
        i = 0
        while (i < nGrams) {
          var j = 0
          while (j < n) { parts(j) = tokens(i + j); j += 1 }
          val gram = UTF8String.concatWs(space, parts: _*)
          val dup = seen.putIfAbsent(gram, i) != null
          prefix(i + 1) = prefix(i) + (if (dup) 0 else 1)
          i += 1
        }
        // token k (0-based) is removed iff it has >= 1 covering gram and
        // every covering gram is a dup: covering grams are
        // [max(0, k-g), min(k, nGrams-1)] — zero non-dups in that range.
        val out = new Array[Boolean](m)
        var k = 0
        while (k < m) {
          val lo = math.max(0, k - g)
          val hi = math.min(k, nGrams - 1)
          out(k) = hi >= lo && prefix(hi + 1) - prefix(lo) == 0
          k += 1
        }
        out
      }
    var nRemoved = 0
    i = 0
    while (i < m) { if (removed(i)) nRemoved += 1; i += 1 }
    val kept = new Array[UTF8String](m - nRemoved)
    var w = 0
    i = 0
    while (i < m) {
      if (!removed(i)) { kept(w) = tokens(i); w += 1 }
      i += 1
    }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
    row.update(0, m.toLong)
    row.update(1, nRemoved.toLong)
    row.update(2, UTF8String.concatWs(space, kept: _*))
    row.asInstanceOf[InternalRow]
  }

  override protected def withNewChildInternal(newChild: Expression): SpanScrubRow =
    copy(child = newChild)
}
