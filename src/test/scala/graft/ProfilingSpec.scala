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

  test("corrMatrix: perfect/anti/zero correlation, pairwise deletion, constant-column NULL") {
    val df = Seq(
      (1.0, 2.0, -1.0, 5.0, Some(1.0)),
      (2.0, 4.0, -2.0, 5.0, Some(4.0)),
      (3.0, 6.0, -3.0, 5.0, None),
      (4.0, 8.0, -4.0, 5.0, Some(2.0))
    ).toDF("a", "b", "neg", "const", "holey")
    val out = Profiling.corrMatrix(df, Seq("a", "b", "neg", "const", "holey"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.getAs[java.lang.Double]("corr"))
          .map(_.toDouble)))).toMap
    assert(out.size === 10) // 5 choose 2
    assert(math.abs(out(("a", "b"))._2.get - 1.0) < 1e-9)   // y = 2x
    assert(math.abs(out(("a", "neg"))._2.get + 1.0) < 1e-9) // y = -x
    assert(out(("a", "const"))._2 === None) // zero variance -> NULL
    // pairwise deletion: (a, holey) uses only the 3 complete rows
    assert(out(("a", "holey"))._1 === 3L)
    assert(out(("a", "b"))._1 === 4L)
    assertThrows[IllegalArgumentException] {
      Profiling.corrMatrix(df, Seq("a"))
    }
    assertThrows[IllegalArgumentException] {
      Profiling.corrMatrix(df, Seq("a", "nope"))
    }
  }
}
