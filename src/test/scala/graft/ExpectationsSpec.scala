package graft

import org.apache.spark.sql.functions._

import graft.operators.Expectations
import graft.operators.Expectations._

/** Pins the data-quality suite semantics: per-check observed math, null
  * handling, pass/fail boundaries, empty-table fail-closed, and guards. */
class ExpectationsSpec extends SparkSpecBase {
  import spark.implicits._

  private val df = Seq(
    (1L, Some(5.0), "a"),
    (2L, Some(50.0), "b"),
    (3L, None, "a"),
    (4L, Some(500.0), "zz") // out of range AND out of set
  ).toDF("id", "v", "cat")

  private def report = Expectations.run(df, Seq(
    Completeness("v", 0.9),           // observed 3/4 = 0.75 -> fail
    Completeness("id", 1.0),          // 4/4 -> pass
    Uniqueness("id", 1.0),            // 4 distinct / 4 -> pass
    Uniqueness("cat", 0.9),           // 3 distinct / 4 = 0.75 -> fail
    InRange("v", 0.0, 100.0, 0.5),    // 2 of 3 non-null in range -> pass
    InSet("cat", Seq("a", "b"), 1.0), // 3 of 4 -> fail
    MinCount(4.0)                     // exactly at threshold -> pass (>=)
  )).collect().map(r => (r.getString(0), r.getString(1)) ->
    ((r.getDouble(2), r.getBoolean(4)))).toMap

  test("observed ratios ignore nulls in the numerator-appropriate way; boundaries are >=") {
    assert(report(("completeness", "v")) === ((0.75, false)))
    assert(report(("completeness", "id")) === ((1.0, true)))
    assert(report(("uniqueness", "id")) === ((1.0, true)))
    assert(report(("uniqueness", "cat")) === ((0.75, false)))
    assert(report(("in_range", "v"))._2 === true)
    assert(math.abs(report(("in_range", "v"))._1 - 2.0 / 3.0) < 1e-15)
    assert(report(("in_set", "cat")) === ((0.75, false)))
    assert(report(("min_count", "*")) === ((4.0, true)))
  }

  test("empty table fails closed on ratio checks and on MinCount") {
    val empty = df.filter(lit(false))
    val rep = Expectations.run(empty, Seq(
      Completeness("v", 0.1), Uniqueness("id", 0.1), MinCount(1.0)))
      .collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(rep === Map(
      "completeness" -> false, "uniqueness" -> false, "min_count" -> false))
  }

  test("guards: empty suite and unknown columns fail loud") {
    intercept[IllegalArgumentException] { Expectations.run(df, Seq.empty) }
    intercept[IllegalArgumentException] {
      Expectations.run(df, Seq(Completeness("nope", 0.5)))
    }
  }
}
