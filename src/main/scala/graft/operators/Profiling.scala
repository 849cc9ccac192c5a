package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Catalog statistics (the ANALYZE TABLE shape): per-column row count,
  * null count, exact distinct count, and min/max — the numbers a
  * cost-based planner, a data-quality monitor, or a migration diff reads
  * first.
  *
  * Scale design (100 TB): one aggregate PER COLUMN, unioned —
  * deliberately N single-column passes rather than one pass with N exact
  * `count_distinct`s, because multiple exact distinct aggregates in one
  * plan make Catalyst Expand every input row N× (the a13/a11 lesson:
  * that blow-up dominated the a11 row until the Expand was removed),
  * while N parquet scans each prune to ONE column and run as independent
  * stages. Exactness is the point of this surface; the one-pass
  * approximate profile is `approx_count_distinct` (the a11 row's HLL
  * path). min/max arrive as strings so heterogeneous columns stack into
  * one frame — cast inputs to a stable-formatting type first (integers,
  * strings; NOT raw doubles, whose string forms are engine-specific).
  */
object Profiling {

  def columnProfile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "at least one column required")
    val missing = columns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns $missing not in frame")
    columns.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_nulls"),
        count_distinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_str"),
        max(col(c)).cast("string").as("max_str"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }.reduce(_ unionAll _)
  }
}
