package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomPrune

/** Pins BloomPrune's result-invariance (sketch must never change the
  * semi-join answer), null-key handling, and that undersizing the sketch
  * only costs false positives — which the exact join then removes. */
class BloomPruneSpec extends SparkSpecBase {
  import spark.implicits._

  private val probe = Seq(
    (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"),
    (6L, "f"), (7L, "g")
  ).toDF("k", "payload")
  private val build = Seq(2L, 4L, 6L, 6L).toDF("bk") // dup build key too

  test("bloom semi-join equals the plain semi-join") {
    val pruned = BloomPrune.semiJoinLong(probe, "k", build, "bk", 100L)
      .select("k").as[Long].collect().sorted
    val plain = probe.join(build.distinct(), col("k") === col("bk"), "left_semi")
      .select("k").as[Long].collect().sorted
    assert(pruned.toSeq === Seq(2L, 4L, 6L))
    assert(pruned.toSeq === plain.toSeq)
  }

  test("null probe keys never match (same as SQL semi-join semantics)") {
    val p = Seq(Some(2L), None, Some(9L)).toDF("k")
    val out = BloomPrune.semiJoinLong(p, "k", build, "bk", 100L)
      .as[Long].collect().toSeq
    assert(out === Seq(2L))
  }

  test("undersized sketch (high fpp) still yields the exact answer") {
    // expectedItems=1 for 3 distinct keys drives fpp way up — every probe
    // row may pass the sketch, but the exact semi-join must still prune.
    val out = BloomPrune.semiJoinLong(probe, "k", build, "bk", 1L, fpp = 0.5)
      .select("k").as[Long].collect().sorted
    assert(out.toSeq === Seq(2L, 4L, 6L))
  }

  test("predicateLong keeps every true match (no false negatives)") {
    val keep = probe.filter(
      BloomPrune.predicateLong(probe, col("k"), build, "bk", 100L))
      .select("k").as[Long].collect().toSet
    assert(Set(2L, 4L, 6L).subsetOf(keep))
  }
}
