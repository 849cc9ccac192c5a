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

  private def executedPlan(name: String): String = {
    val q = SparkEntry.queries(name)(spark, sf0001)
    q.collect()
    q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("round-9 graph/basket rows: every join is an equi-join — no nested loop ever") {
    // triangles and association rules are both pair self-joins — the
    // shapes that silently degrade to cartesians when a key is lost in
    // a refactor. Values stay right; only the plan pin catches it.
    Seq("graph_triangles", "graph_components").foreach { n =>
      val plan = executedPlan(n)
      assert(!plan.contains("CartesianProduct"),
        s"$n planned a cartesian:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$n planned a nested loop:\n$plan")
    }
    // the rules row carries EXACTLY ONE nested loop by design: the
    // one-row n_baskets aggregate cross-joined onto every rule — a
    // broadcast of a scalar, not a pair blow-up. Anything beyond that
    // one (or any true cartesian) is the regression this pin catches.
    val rules = executedPlan("mb_assoc_rules")
    assert(!rules.contains("CartesianProduct"),
      s"mb_assoc_rules planned a cartesian:\n$rules")
    assert("BroadcastNestedLoopJoin".r.findAllIn(rules).length <= 1,
      s"mb_assoc_rules grew extra nested loops:\n$rules")
  }

  test("mb_assoc_prune_stats: scalar cross-joins only — the frequent-item " +
    "flag broadcasts, the basket relation is never nested-looped") {
    val plan = executedPlan("mb_assoc_prune_stats")
    assert(!plan.contains("CartesianProduct"),
      s"prune stats planned a cartesian:\n$plan")
    // expected nested loops: ONLY the 1-row-aggregate crosses (n_baskets
    // onto items ×2, itemStats onto pairSums) — broadcasts of scalars.
    // More of them would mean the (bk, it) relation itself entered a
    // nested loop (the actual blow-up this pin guards).
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length <= 3,
      s"prune stats grew extra nested loops:\n$plan")
  }

  test("a40_sgd_model: the serve plan is one aggregate over a map-only " +
    "projection — no join, no window, no sort") {
    val plan = executedPlan("a40_sgd_model")
    // the fit runs at construction (driver-collected moments + epochs of
    // aggregates); the REGISTERED plan is sgdPredict + one invariant
    // aggregate. Any join/sort appearing here means serving stopped
    // being scan-speed.
    assert(!plan.contains("Join"), s"sgd serve grew a join:\n$plan")
    assert(!plan.contains("Window"), s"sgd serve grew a window:\n$plan")
  }

  test("keyword search ranks via TakeOrderedAndProject, never a global sort") {
    val plan = executedPlan("ext_keyword_search")
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition top-k + driver merge:\n$plan")
  }

  test("cluster_kmeans: centroid joins broadcast the k-row side only — the corpus is never broadcast") {
    val plan = executedPlan("cluster_kmeans")
    // every nested-loop join in the Lloyd rounds is the EXPECTED
    // broadcast cross join against the ≤k-row centroid frame; a
    // SortMergeJoin or shuffled join against centroids would mean the
    // tiny side stopped broadcasting (scale regression)
    assert(!plan.contains("CartesianProduct"),
      s"kmeans planned a non-broadcast cartesian:\n$plan")
  }
}
