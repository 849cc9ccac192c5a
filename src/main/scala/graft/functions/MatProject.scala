package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for a full basis projection of a numeric
  * array column: out[c] = (Σ_j x_j · comps[c][j] − mu[c]) · scales[c]
  * for every kept component c, in ONE generated loop nest.
  *
  * Why a custom Expression (the [[DotProduct]] rationale, one level up):
  * the k-coordinate projection as k separate dot expressions inside one
  * Project blows the whole-stage-codegen expression budget at real
  * (k, d) — Spark falls back to interpreted eval and pays per-element
  * accessor overhead × k·d per row (measured 230 µs/row at k=d=64 vs
  * ~2 µs for the fused loop: it made emb_pca_fit the most expensive
  * bench row twice over). Here the basis rides as one reference object
  * (flattened row-major k·d doubles), and codegen emits a tight
  * two-level loop — whole-stage-friendly, single expression.
  *
  * Null semantics replicate the per-coordinate dot form exactly: a NULL
  * input array → NULL output; a null ELEMENT anywhere, or a length ≠ d,
  * → an array of k NULL coordinates (every dot touches every element,
  * so every coordinate is poisoned — never a plausible partial
  * projection). Interpreted eval and codegen share the identical
  * accumulation order (j ascending), so results are bit-equal. */
case class MatProject(child: Expression, comps: Array[Double],
                      mu: Array[Double], scales: Array[Double], d: Int)
    extends UnaryExpression {

  require(d >= 1 && comps.length % d == 0 &&
    comps.length / d == mu.length && mu.length == scales.length,
    s"inconsistent basis shape: ${comps.length} cells, d=$d, " +
      s"${mu.length} offsets, ${scales.length} scales")

  private val k = mu.length

  override def prettyName: String = "graft_mat_project"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float> or array<double> input, " +
            s"got ${other.catalogString}")
    }

  private def allNulls: GenericArrayData =
    new GenericArrayData(new Array[Any](k))

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != d) return allNulls
    val isFloat = elemIsFloat
    var j = 0
    while (j < d) {
      if (a.isNullAt(j)) return allNulls
      j += 1
    }
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      var acc = 0.0
      val base = c * d
      var i = 0
      while (i < d) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        acc += x * comps(base + i)
        i += 1
      }
      out(c) = (acc - mu(c)) * scales(c)
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val compsRef = ctx.addReferenceObj("comps", comps, "double[]")
    val muRef = ctx.addReferenceObj("mu", mu, "double[]")
    val scRef = ctx.addReferenceObj("scales", scales, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      s"""
         |Object[] $out = new Object[$k];
         |boolean $bad = $a.numElements() != $d;
         |if (!$bad) {
         |  for (int $j = 0; $j < $d; $j++) {
         |    if ($a.isNullAt($j)) { $bad = true; break; }
         |  }
         |}
         |if (!$bad) {
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $acc = 0.0;
         |    int $base = $c * $d;
         |    for (int $i = 0; $i < $d; $i++) {
         |      $acc += (double) $a.$get($i) * $compsRef[$base + $i];
         |    }
         |    $out[$c] = ($acc - $muRef[$c]) * $scRef[$c];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MatProject =
    copy(child = newChild)
}
