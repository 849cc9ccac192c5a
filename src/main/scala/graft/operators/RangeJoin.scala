package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join — points joined to the intervals that contain them
  * (`start <= point.ts < end`), the second classic time-series join Spark
  * has no primitive for (attribution windows, validity periods, sensor
  * epochs).
  *
  * == Why bucket ==
  * With no equi-key at all, Spark plans a bare range predicate as
  * BroadcastNestedLoopJoin — O(|points| × |intervals|) comparisons, a
  * non-starter at scale. With a key it plans the equi-join and evaluates
  * the range as a residual filter over every same-key pair — fine until a
  * key is hot. Bucketing manufactures a uniform equi-key from time itself:
  *
  *   - each point lands in exactly ONE bin: `floor(µs(ts) / binMicros)`,
  *   - each interval EXPLODES to every bin it overlaps
  *     (`sequence(bin(start), bin(end - 1µs))`),
  *   - equi-join on (keys…, bin), then the exact range predicate as the
  *     residual.
  *
  * Because a point has a single bin, every qualifying (point, interval)
  * pair is emitted exactly once — no post-dedup pass. The cost knob is
  * `binMicros`: intervals replicate ×(len/bin + 1), and a bin's points
  * only meet that bin's intervals. Set it near the median interval length
  * (replication ≈ 2×) and the join is a plain shuffled hash/sort-merge
  * join on a high-cardinality composite key — skew-free even when the
  * original key is hot, because time spreads it. RangeJoinSpec pins that
  * the unkeyed bucketed plan contains NO nested-loop/cartesian operator
  * while the naive control does.
  *
  * Intervals with `end <= start` (empty or inverted) and NULL bounds drop
  * out, matching the SQL predicate's semantics.
  */
object RangeJoin {

  private val BIN = "__range_bin"

  /** Inner join of `points` to the `intervals` containing them.
    *
    * @param keys      optional equality keys present on BOTH sides; pass
    *                  Nil for a pure range join (still equi-planned, on
    *                  the bin alone)
    * @param pointTs   timestamp column on `points`
    * @param startCol  interval start on `intervals` (inclusive)
    * @param endCol    interval end on `intervals` (EXCLUSIVE)
    * @param binMicros bucket width in microseconds (e.g. 4h =
    *                  14_400_000_000L); choose ≈ the median interval
    *                  length to keep interval replication ≈ 2×
    * @return points.* ++ intervals.* (column names must not collide apart
    *         from `keys`, which appear once)
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pointTs: String,
                      startCol: String, endCol: String,
                      binMicros: Long): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keys
    require(overlap.isEmpty, s"non-key column collision: $overlap")

    // Epochs in this engine are post-1970 (positive µs), so integral `div`
    // IS floor division here; sub-epoch timestamps would need floor().
    def bin(tsExpr: String) =
      expr(s"unix_micros(cast($tsExpr as timestamp)) div ${binMicros}L")

    val binnedPoints = points.withColumn(BIN, bin(pointTs))
    val binnedIntervals = intervals
      .where(col(endCol) > col(startCol))
      .withColumn(BIN, explode(sequence(
        bin(startCol),
        bin(s"$endCol - INTERVAL 1 MICROSECOND"))))

    binnedPoints
      .join(binnedIntervals, (keys :+ BIN).toIndexedSeq, "inner")
      .where(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop(BIN)
  }

  /** Interval-OVERLAP join — pairs of intervals that intersect
    * (`lStart < rEnd AND rStart < lEnd`, both sides half-open [start,
    * end)): the third classic temporal join (concurrent sessions,
    * conflicting bookings, validity-period reconciliation), one step up
    * from [[pointInInterval]] where BOTH sides have extent.
    *
    * Same manufactured equi-key, plus an OWNERSHIP rule for exactly-once:
    * both sides explode to every bin they touch, so an overlapping pair
    * co-occurs in every bin their spans share — the join keeps the pair
    * only in the bin where the overlap STARTS (`bin(greatest(lStart,
    * rStart))`), which by construction is a bin both rows were exploded
    * into. No post-dedup `distinct` (a full shuffle of the output) needed.
    *
    * Replication and skew behave as in [[pointInInterval]]: cost knob is
    * `binMicros` vs interval length, and the composite (keys…, bin) key
    * spreads hot keys across time. Empty/inverted/NULL-bounded intervals
    * drop out on either side.
    *
    * @return left.* ++ right.* (non-key names must not collide) */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                  lStart: String, lEnd: String,
                  rStart: String, rEnd: String,
                  binMicros: Long): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(overlap.isEmpty, s"non-key column collision: $overlap")
    require(!left.columns.contains(BIN) && !right.columns.contains(BIN),
      s"reserved column name $BIN in inputs")

    def bin(tsExpr: String) =
      expr(s"unix_micros(cast($tsExpr as timestamp)) div ${binMicros}L")
    def explodeBins(df: DataFrame, s: String, e: String) =
      df.where(col(e) > col(s))
        .withColumn(BIN, explode(sequence(
          bin(s), bin(s"$e - INTERVAL 1 MICROSECOND"))))

    explodeBins(left, lStart, lEnd)
      .join(explodeBins(right, rStart, rEnd), (keys :+ BIN).toIndexedSeq, "inner")
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .where(col(BIN) === greatest(bin(lStart), bin(rStart)))
      .drop(BIN)
  }
}
