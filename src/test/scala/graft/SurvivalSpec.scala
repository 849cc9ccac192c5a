package graft

import org.apache.spark.sql.functions._

import graft.operators.Survival

/** Pins the Kaplan-Meier risk-table semantics the sf0.01 differential
  * can't isolate: censored subjects shrink later risk sets WITHOUT
  * emitting steps, exact per-step arithmetic, group isolation. */
class SurvivalSpec extends SparkSpecBase {
  import spark.implicits._

  test("hand-checked risk table: censoring shapes n_at_risk but emits no step") {
    // durations: 1(event) 2(censored) 3(event) 3(event) 4(censored) 5(event)
    val df = Seq(
      ("g", 1L, true), ("g", 2L, false), ("g", 3L, true),
      ("g", 3L, true), ("g", 4L, false), ("g", 5L, true),
      // second group: one event — isolation check
      ("h", 7L, true)
    ).toDF("k", "dur", "obs")
    val out = Survival.kaplanMeierTable(df, Seq("k"), col("dur"), col("obs"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // g: step at 1: risk 6, 1 event, factor 5/6
    assert(out(("g", 1L)) === ((6L, 1L, 5.0 / 6.0)))
    // the d=2 censor emits NO step but the d=3 risk set excludes it
    assert(out(("g", 3L)) === ((4L, 2L, 0.5)))
    // the d=4 censor again shrinks the final risk set to 1
    assert(out(("g", 5L)) === ((1L, 1L, 0.0)))
    assert(out(("h", 7L)) === ((1L, 1L, 0.0)))
    assert(out.size === 4) // exactly the observed-event steps
  }

  test("all-censored group emits nothing; nulls excluded; layout-invariant") {
    val df = Seq(
      ("c", Some(3L), Some(false)), ("c", Some(9L), Some(false)),
      ("g", Some(1L), Some(true)), ("g", None, Some(true)),
      ("g", Some(2L), None)
    ).toDF("k", "dur", "obs")
    val out = Survival.kaplanMeierTable(df, Seq("k"), col("dur"), col("obs"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // only g's single clean event row survives; its risk set is 1 (the
    // null-duration and null-flag rows are excluded entirely)
    assert(out.toSeq === Seq(("g", 1L, 1L)))
    val repart = Survival.kaplanMeierTable(df.repartition(5), Seq("k"),
      col("dur"), col("obs"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(repart.toSeq === out.toSeq)
  }
}
