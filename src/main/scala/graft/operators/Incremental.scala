package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key aggregate STATE table
  * that a new batch MERGES into, so an append-only fact stream never
  * rescans its history (the reference appends monthly batches to a table
  * it then re-aggregates in full — `MySQL Data Push Scripts/main.py`
  * appends, train.py re-reads everything; at 100 TB the re-read is the
  * whole job).
  *
  * The state carries only MERGEABLE aggregates — count, sum, min, max —
  * under the registry's exact BIGINT micro-unit convention; anything
  * derived (mean = s/n) is computed at read time from the state. Merging
  * is associative and commutative, so state(old ∪ batch) ≡
  * merge(state(old), state(batch)) — the invariant the oracle-paired row
  * checks end-to-end through a parquet persistence hop.
  */
object Incremental {

  /** Column set the state table carries per key. */
  private val stateCols = Seq("n", "sum_micro", "min_micro", "max_micro")

  /** Aggregate a batch of (key..., value DOUBLE) into per-key state:
    * n, sum/min/max in exact micro-units. NULL values count toward `n`
    * rows only via the non-null filter (they carry no measure). */
  def aggState(batch: DataFrame, key: Seq[String],
               valueCol: String = "value"): DataFrame =
    batch
      .filter(col(valueCol).isNotNull)
      .withColumn("__xm", expr(s"CAST(round($valueCol * 1e6) AS BIGINT)"))
      .groupBy(key.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__xm")).as("sum_micro"),
        min(col("__xm")).as("min_micro"),
        max(col("__xm")).as("max_micro"))

  /** Merge two state tables (same key columns). Keys present in only one
    * side pass through — the full-outer shape. The merge shuffles
    * |keys| rows, not |history| rows: that is the entire point. */
  def merge(a: DataFrame, b: DataFrame, key: Seq[String]): DataFrame = {
    require(stateCols.forall(a.columns.contains) &&
      stateCols.forall(b.columns.contains),
      s"state tables must carry ${stateCols.mkString(", ")}")
    a.unionByName(b)
      .groupBy(key.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_micro")).as("sum_micro"),
        min(col("min_micro")).as("min_micro"),
        max(col("max_micro")).as("max_micro"))
  }
}
