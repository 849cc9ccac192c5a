package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** b-bit random-hyperplane LSH signature of a numeric vector for hash
  * table `table`: bit j = [v · r_{table,j} > 0] where hyperplane entry
  * (table, j, d) is ±1 by the parity of xxhash64(table, j, d); the bits
  * fold MSB-first into a long (bit 0 of the loop is the highest-order
  * bit, exactly like the `aggregate(..., (acc, bit) -> acc * 2 + bit)`
  * form it replaces).
  *
  * Value-identical to the composable form
  * (`aggregate(transform(sequence(0, bits-1), j -> CASE WHEN
  *   aggregate(zip_with(v, sequence(0, size(v)-1), (x, d) -> x * ±1.0D),
  *   0D, (acc, x) -> acc + x) > 0D THEN 1L ELSE 0L END), 0L,
  *   (acc, bit) -> acc * 2 + bit)`):
  *  - the hash chain is Spark's multi-arg xxhash64 over three INT values —
  *    seed 42, then XXH64.hashInt per argument in order (ints hash via
  *    hashInt, NOT hashLong — the two diverge);
  *  - elements widen to double BEFORE the sign multiply and accumulate
  *    left-to-right in index order, so the per-bit sums are bit-equal;
  *  - a null element poisons the zip_with fold to NULL in the HOF form,
  *    whose `CASE WHEN NULL > 0D` lands in the ELSE branch — so a null
  *    slot yields bit 0 here too, not a NULL signature.
  *
  * Why native (flagged in the round-2 verdict): the nested interpreted
  * HOFs cost ~µs per (bit, dim) lambda call × 8 tables × 4 bits × 64 dims
  * per row — the signature computation dominated ann_lsh_topk (3.4 s at
  * sf0.1). This loop is bits × dims multiply-adds (~ns each).
  */
case class HyperplaneSig(child: Expression, bits: Int, table: Int)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_hyperplane_sig"
  override def dataType: DataType = LongType

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
          if bits > 0 && bits < 64 && table >= 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>/array<double>, 0 < bits < 64 " +
            s"and table >= 0, got ${other.catalogString} / bits=$bits / table=$table")
    }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isFloat = elemIsFloat
    val tableSeed = XXH64.hashInt(table, 42L)
    var sig = 0L
    var j = 0
    while (j < bits) {
      val jSeed = XXH64.hashInt(j, tableSeed)
      var acc = 0.0
      var sawNull = false
      var d = 0
      while (d < n && !sawNull) {
        if (arr.isNullAt(d)) {
          sawNull = true
        } else {
          val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
          val sign = if ((XXH64.hashInt(d, jSeed) & 1L) == 1L) 1.0 else -1.0
          acc += x * sign
        }
        d += 1
      }
      val bit = if (!sawNull && acc > 0.0) 1L else 0L
      sig = sig * 2 + bit
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}
