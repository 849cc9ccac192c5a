package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (Z-order) clustering — the
  * Delta OPTIMIZE ZORDER BY / Iceberg sort-order technique that makes
  * min/max file skipping work on TWO filter columns at once. A table
  * range-partitioned and sorted by a single column gives tight per-file
  * ranges on that column and FULL-WIDTH ranges on every other; sorting
  * by the bit-interleaved z-value gives every file a small bounding BOX
  * in (x, y) space, so a scan filtered on either dimension (or both)
  * prunes most files from parquet footer stats alone. At 100 TB this is
  * the difference between "point query reads one file" and "point query
  * on the second column reads the whole table".
  *
  * The z-value is pure integer bit arithmetic — engine-exact by
  * construction (no floats anywhere), which is why the registered row
  * can hash-pair the values themselves.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of `x` (even
    * positions) and `y` (odd positions). Inputs are clamped to
    * [0, 2^bits) — callers bucketize real-valued dimensions first
    * (standard z-order practice; out-of-range values land on the
    * boundary cell rather than wrapping). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val maxV = lit((1L << bits) - 1)
    val cx = least(greatest(x.cast("long"), lit(0L)), maxV)
    val cy = least(greatest(y.cast("long"), lit(0L)), maxV)
    (0 until bits).map { i =>
      shiftleft(shiftright(cx, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(cy, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-clustered: range-partition into ~`nFiles` tasks by the
    * z-value and sort within each — every output file covers one compact
    * z-range, i.e. one small (x, y) bounding box for footer-stats
    * skipping. The z column itself is not persisted (layout, not data).
    */
  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
                    bits: Int, nFiles: Int): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    df.withColumn("__z", zValue(x, y, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
