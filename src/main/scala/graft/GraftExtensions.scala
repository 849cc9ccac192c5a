package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{DotProduct, SimHash63, SortedIntersectCount}

/** Catalyst extension entry point: installs the engine's native functions
  * and optimizer rules into any session via
  * `--conf spark.sql.extensions=graft.GraftExtensions` — no code changes
  * needed on the consuming side (spark-sql / spark-submit / thrift all
  * work). `GraftFunctions.register` remains the in-process equivalent for
  * sessions created without the conf.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(clazz: Class[_], name: String, usage: String) =
      new ExpressionInfo(clazz.getName, null, name, usage, "")

    def arity(name: String, n: Int)(exprs: Seq[Expression]): Seq[Expression] = {
      if (exprs.length != n)
        throw new IllegalArgumentException(
          s"$name takes exactly $n argument(s), got ${exprs.length}")
      exprs
    }
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info(classOf[DotProduct], "graft_dot",
        "_FUNC_(a, b) - double dot product of two numeric arrays"),
      { exprs: Seq[Expression] =>
        val e = arity("graft_dot", 2)(exprs); DotProduct(e(0), e(1)) }))
    ext.injectFunction((FunctionIdentifier("graft_sorted_intersect_count"),
      info(classOf[SortedIntersectCount], "graft_sorted_intersect_count",
        "_FUNC_(a, b) - |A∩B| of two sorted distinct bigint arrays"),
      { exprs: Seq[Expression] =>
        val e = arity("graft_sorted_intersect_count", 2)(exprs)
        SortedIntersectCount(e(0), e(1)) }))
    ext.injectFunction((FunctionIdentifier("graft_simhash63"),
      info(classOf[SimHash63], "graft_simhash63",
        "_FUNC_(a) - 63-bit simhash of a bigint array"),
      { exprs: Seq[Expression] =>
        val e = arity("graft_simhash63", 1)(exprs); SimHash63(e(0)) }))
    ext.injectOptimizerRule(_ => SimplifySelfIntersect)
  }
}

/** |A ∩ A| over a distinct array is just its size: rewrite the degenerate
  * self-intersect into `size(a)`, skipping the merge loop entirely. Small
  * but real: the near-dup pair generators compare each doc against a
  * renamed copy of the same relation, and a missed `doc_a < doc_b`
  * predicate (or a deliberate self-similarity column) produces exactly
  * this shape. Also the engine's demonstration that graft expressions
  * participate in Catalyst optimization like built-ins do. */
object SimplifySelfIntersect extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case SortedIntersectCount(a, b) if a.semanticEquals(b) && a.deterministic =>
        Cast(Size(a), org.apache.spark.sql.types.LongType)
    }
}
