package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, ExpressionInfo, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{GraftFunctions, SortedIntersectCount}

/** Catalyst extension entry point: installs the engine's native functions
  * and optimizer rules into any session via
  * `--conf spark.sql.extensions=graft.GraftExtensions` — no code changes
  * needed on the consuming side (spark-sql / spark-submit / thrift all
  * work). `GraftFunctions.register` remains the in-process equivalent for
  * sessions created without the conf; both surfaces iterate the SAME
  * [[GraftFunctions.builders]] table, so every native function (including
  * the int-literal-parameterised ones) is available from plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, clazz, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, null, name, usage, ""), builder))
    }
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
