package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct xxhash64 values of the word n-grams of a token array —
  * the shingle-set builder, fused into one pass.
  *
  * Value-identical (modulo 2⁻⁶⁴ hash collisions) to the composable form
  * `array_sort(transform(array_distinct(transform(sequence(...),
  * i -> concat_ws(' ', ws[i..i+n-1]))), s -> xxhash64(s)))`: each gram is
  * concatenated with the same UTF8String.concatWs and hashed with the
  * same XXH64-over-bytes primitive Spark's xxhash64 uses. The HOF chain
  * paid interpreted lambdas + per-gram array churn and was the dominant
  * cost of every shingle-based dedup query (~6.5 s for 5k docs at sf0.1);
  * this loop is a plain traversal + sort.
  *
  * CodegenFallback: the eval is already a tight primitive loop; breaking
  * whole-stage codegen for the projection costs far less than the chain
  * it replaces. Fewer than n tokens → empty array (same guard as
  * Dedup.shingles).
  */
case class WordNGramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_ngram_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> and n > 0, got " +
            s"${other.catalogString} / n=$n")
    }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    val grams = new Array[Long](len - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      val g = UTF8String.concatWs(space, parts: _*)
      grams(i) = XXH64.hashUnsafeBytes(
        g.getBaseObject, g.getBaseOffset, g.numBytes, 42L)
      i += 1
    }
    java.util.Arrays.sort(grams)
    // dedupe the sorted run in place
    var w = 0
    var r = 0
    while (r < grams.length) {
      if (w == 0 || grams(r) != grams(w - 1)) { grams(w) = grams(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(grams, w))
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGramHashes =
    copy(child = newChild)
}
