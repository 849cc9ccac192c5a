package graft

/** Physical-plan pins for the TPC-H-shaped queries whose VALUE is the
  * join shape (values are already oracle-checked): the decorrelated
  * EXISTS/NOT-EXISTS of q21 must plan as real semi/anti hash joins —
  * a regression to a nested loop would still return the right rows,
  * which is exactly why only a plan pin can catch it. */
class TpchPlanSpec extends SparkSpecBase {

  test("q21: double-correlation plans as semi + anti joins, never a nested loop") {
    val q = SparkEntry.queries("q21_waiting_suppliers")(spark, sf0001)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"correlation must stay decorrelated:\n$plan")
    assert(plan.contains("LeftSemi"), s"expected a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"expected an anti join:\n$plan")
  }

  test("q16: NOT IN plans as an anti join — or AQE elides it when the exclusion set is empty") {
    import org.apache.spark.sql.functions.col
    val q = SparkEntry.queries("q16_supplier_count")(spark, sf0001)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"NOT IN must not degrade to a nested loop:\n$plan")
    val excluded = Tables.supplier(spark, sf0001)
      .filter(col("s_acctbal") < 0).count()
    if (excluded > 0)
      assert(plan.contains("LeftAnti"), s"expected an anti join:\n$plan")
    else
      // sf0.001 has no negative-balance suppliers: AQE's empty-relation
      // propagation must remove the dead anti join at runtime — the
      // adaptive behavior the 100-TB story leans on, pinned here.
      assert(!plan.contains("LeftAnti"),
        s"empty exclusion set should have elided the anti join:\n$plan")
  }
}
