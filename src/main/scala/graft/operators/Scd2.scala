package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD type-2 dimension maintenance: merge a point-in-time SNAPSHOT of a
  * dimension into a history table that keeps one row per (key, version)
  * with a [valid_from, valid_to) validity interval (valid_to NULL =
  * current). The warehouse primitive behind "what did this customer's
  * segment look like when the order was placed" — the dimension-side twin
  * of the as-of join ([[AsOfJoin]] then serves the interval lookup).
  *
  * Semantics (no-delete variant): a key absent from the snapshot keeps
  * its current row open; a changed tracked-attribute set closes the
  * current row at `effectiveAt` and opens a new one; an unchanged key is
  * untouched; a brand-new key opens its first row. Tracked attributes
  * compare null-safely (<=>).
  *
  * Scale: one full-outer join of the OPEN slice against the snapshot on
  * the dimension key (both sides dimension-sized, co-partitioned by the
  * join), plus a pass-through of the closed history — the 100 TB fact
  * table is never touched.
  */
object Scd2 {

  /** Schema helper: turn a bare snapshot into an initial history. */
  def initial(snapshot: DataFrame, effectiveAt: java.sql.Date): DataFrame =
    snapshot
      .withColumn("valid_from", lit(effectiveAt))
      .withColumn("valid_to", lit(null).cast("date"))

  def merge(
      history: DataFrame,
      snapshot: DataFrame,
      key: Seq[String],
      tracked: Seq[String],
      effectiveAt: java.sql.Date): DataFrame = {
    val closed = history.filter(col("valid_to").isNotNull)
    val open = history.filter(col("valid_to").isNull)

    val o = open.select(
      key.map(col) ++ tracked.map(c => col(c).as(s"__o_$c"))
        :+ col("valid_from").as("__o_from"): _*)
    val n = snapshot.select(
      key.map(col) ++ tracked.map(c => col(c).as(s"__n_$c"))
        :+ lit(true).as("__in_snap"): _*)
    val j = o.join(n, key, "full_outer")
      .withColumn("__has_open", col("__o_from").isNotNull)
      .withColumn("__changed",
        col("__has_open") && coalesce(col("__in_snap"), lit(false)) &&
          !tracked.map(c => col(s"__o_$c") <=> col(s"__n_$c"))
            .reduce(_ && _))
      .localCheckpoint(eager = false) // consumed by three slices below

    // current rows that survive: unchanged, or key absent from snapshot
    val stillOpen = j.filter(col("__has_open") && !col("__changed"))
      .select(key.map(col) ++ tracked.map(c => col(s"__o_$c").as(c))
        :+ col("__o_from").as("valid_from")
        :+ lit(null).cast("date").as("valid_to"): _*)
    // current rows superseded by a changed snapshot value: close them
    val expired = j.filter(col("__changed"))
      .select(key.map(col) ++ tracked.map(c => col(s"__o_$c").as(c))
        :+ col("__o_from").as("valid_from")
        :+ lit(effectiveAt).as("valid_to"): _*)
    // new versions: changed keys and brand-new keys
    val opened = j.filter(col("__in_snap") && (col("__changed") || !col("__has_open")))
      .select(key.map(col) ++ tracked.map(c => col(s"__n_$c").as(c))
        :+ lit(effectiveAt).as("valid_from")
        :+ lit(null).cast("date").as("valid_to"): _*)

    closed.select(stillOpen.columns.map(col): _*)
      .unionByName(stillOpen).unionByName(expired).unionByName(opened)
  }
}
