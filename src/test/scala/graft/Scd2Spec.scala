package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.{Incremental, Scd2}

/** Pins SCD2 merge semantics on hand-built snapshots (change, no-change,
  * new key, absent key, null-tracked values, chained merges) and the
  * incremental-state merge invariant on edge batches. */
class Scd2Spec extends SparkSpecBase {
  import spark.implicits._

  private val d1 = Date.valueOf("2024-01-01")
  private val d2 = Date.valueOf("2024-02-01")
  private val d3 = Date.valueOf("2024-03-01")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("seg"),
      Option(r.getAs[Date]("valid_from")).map(_.toString).orNull,
      Option(r.getAs[Date]("valid_to")).map(_.toString).orNull)).toSet

  test("merge: change closes + opens; unchanged and absent keys stay open; new key opens") {
    val h0 = Scd2.initial(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("user_id", "seg"), d1)
    // user 1 changes, user 2 unchanged, user 3 absent, user 4 new
    val snap = Seq((1L, "x"), (2L, "b"), (4L, "d")).toDF("user_id", "seg")
    val h1 = Scd2.merge(h0, snap, Seq("user_id"), Seq("seg"), d2)
    assert(rows(h1) === Set(
      (1L, "a", "2024-01-01", "2024-02-01"),
      (1L, "x", "2024-02-01", null),
      (2L, "b", "2024-01-01", null),
      (3L, "c", "2024-01-01", null),
      (4L, "d", "2024-02-01", null)))
  }

  test("chained merges accumulate versions; closed history is untouched") {
    val h0 = Scd2.initial(Seq((1L, "a")).toDF("user_id", "seg"), d1)
    val h1 = Scd2.merge(h0, Seq((1L, "b")).toDF("user_id", "seg"),
      Seq("user_id"), Seq("seg"), d2)
    val h2 = Scd2.merge(h1, Seq((1L, "c")).toDF("user_id", "seg"),
      Seq("user_id"), Seq("seg"), d3)
    assert(rows(h2) === Set(
      (1L, "a", "2024-01-01", "2024-02-01"),
      (1L, "b", "2024-02-01", "2024-03-01"),
      (1L, "c", "2024-03-01", null)))
  }

  test("null tracked values compare null-safely (null -> null is no change)") {
    val h0 = Scd2.initial(
      Seq((1L, null: String), (2L, "b")).toDF("user_id", "seg"), d1)
    val snap = Seq((1L, null: String), (2L, null: String)).toDF("user_id", "seg")
    val h1 = Scd2.merge(h0, snap, Seq("user_id"), Seq("seg"), d2)
    assert(rows(h1) === Set(
      (1L, null, "2024-01-01", null), // null -> null: unchanged
      (2L, "b", "2024-01-01", "2024-02-01"), // b -> null: a real change
      (2L, null, "2024-02-01", null)))
  }

  test("incremental state: empty batch and single-key batch merge exactly") {
    val old = Seq((1L, "a", 1.25), (2L, "a", -0.5), (3L, "b", 2.0))
      .toDF("event_id", "event_type", "value")
    val batch = Seq((4L, "a", 10.0)).toDF("event_id", "event_type", "value")
    val empty = batch.filter(lit(false))

    val full = Incremental.aggState(old.unionByName(batch), Seq("event_type"))
    val merged = Incremental.merge(
      Incremental.aggState(old, Seq("event_type")),
      Incremental.aggState(batch, Seq("event_type")), Seq("event_type"))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)

    val idMerge = Incremental.merge(
      Incremental.aggState(old, Seq("event_type")),
      Incremental.aggState(empty, Seq("event_type")), Seq("event_type"))
    val base = Incremental.aggState(old, Seq("event_type"))
    assert(idMerge.exceptAll(base).isEmpty && base.exceptAll(idMerge).isEmpty)
  }
}
