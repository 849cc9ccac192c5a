package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for Σ aᵢ·bᵢ over two numeric array columns,
  * accumulating in double, left-to-right.
  *
  * Why a custom Expression (SURVEY.md §7 "custom Catalyst vs built-in"):
  * the composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — is a
  * chain of interpreted higher-order functions that allocates an
  * intermediate array per row and pays ~µs/element lambda overhead; on an
  * O(n²) similarity join that's the whole runtime. This expression
  * whole-stage-codegens to a tight primitive loop (~ns/element), with an
  * interpreted eval of the IDENTICAL accumulation order, so results are
  * bit-equal to the HOF form and to a sequential-fold SQL oracle.
  *
  * Elements are read as float or double per the input type and widened to
  * double BEFORE multiplying (float·float in float32 would lose the bits
  * a double-precision oracle computes).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_dot"
  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double> inputs, " +
          s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  // Mismatched lengths → NULL, matching the HOF form this expression
  // claims bit-equality with (zip_with pads the shorter array with nulls,
  // which poison the fold): a corrupt mixed-dimension vector must surface
  // as NULL, never as a plausible partial dot product.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Session registration for the engine's native functions. Idempotent. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    def reg(name: String, make: (Expression, Expression) => Expression): Unit =
      registry.createOrReplaceTempFunction(
        name,
        { exprs: Seq[Expression] =>
          require(exprs.length == 2, s"$name takes exactly 2 arguments")
          make(exprs.head, exprs(1))
        },
        "built-in")
    reg("graft_dot", DotProduct(_, _))
    reg("graft_sorted_intersect_count", SortedIntersectCount(_, _))
    registry.createOrReplaceTempFunction(
      "graft_simhash63",
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_simhash63 takes exactly 1 argument")
        SimHash63(exprs.head)
      },
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_ngram_hashes",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "graft_ngram_hashes takes exactly 2 arguments")
        val n = exprs(1) match {
          case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
            e.eval().asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"graft_ngram_hashes n must be an int literal, got $other")
        }
        WordNGramHashes(exprs.head, n)
      },
      "built-in")
    registry.createOrReplaceTempFunction(
      "graft_minhash_sig",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "graft_minhash_sig takes exactly 2 arguments")
        val numPerm = exprs(1) match {
          case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
            e.eval().asInstanceOf[Int]
          case other => throw new IllegalArgumentException(
            s"graft_minhash_sig numPerm must be an int literal, got $other")
        }
        MinHashSig(exprs.head, numPerm)
      },
      "built-in")
  }
}
