package graft

import org.apache.spark.sql.functions._

import graft.operators.Profiling

/** Pins the column-profile semantics the oracle row exercises only on
  * clean data: null accounting (nulls excluded from ndv/min/max), and
  * the loud missing-column guard. */
class ProfilingSpec extends SparkSpecBase {
  import spark.implicits._

  test("nulls counted apart; ndv and min/max ignore them; guard is loud") {
    val df = Seq(
      (Some(3L), Some("b")), (None, Some("a")), (Some(3L), None),
      (Some(7L), Some("a"))
    ).toDF("x", "s")
    val out = Profiling.columnProfile(df, Seq("x", "s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(out("x") === ((4L, 1L, 2L, "3", "7")))
    assert(out("s") === ((4L, 1L, 2L, "a", "b")))
    assertThrows[IllegalArgumentException] {
      Profiling.columnProfile(df, Seq("x", "nope"))
    }
  }
}
