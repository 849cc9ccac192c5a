package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands relational patterns — the two classic "SQL is
  * awkward at this" shapes every warehouse eventually needs, as
  * first-class distributed operators. Both are pure window arithmetic on
  * exact values (timestamps/strings/integers), so the cross-engine
  * differential is exact by construction, and both shuffle ONCE on the
  * group key (windows are per-group; no global sort, no driver state).
  */
object Intervals {

  /** Merge overlapping-or-touching intervals per group (the "islands"
    * half of gaps-and-islands): input rows carry [start, end] (end
    * inclusive-or-exclusive is the caller's convention — touching means
    * `start ≤ running_max_end`); output one row per maximal merged
    * island: `(group…, island_id, start, end, n_intervals)` with
    * island_id numbering islands 1..k per group in time order.
    *
    * Algorithm: order by (start, end), running max of `end` over strictly
    * PRECEDING rows; a row whose start exceeds that running max opens a
    * new island; island_id = cumulative sum of open flags — the textbook
    * single-pass window chain (two window functions, one shuffle).
    * Rows with NULL start/end are excluded. Malformed intervals
    * (end < start) fail loud rather than silently merging wrong. */
  def mergeIntervals(df: DataFrame, group: Seq[String], start: Column,
                     end: Column): DataFrame = {
    val gc = group.map(col)
    val base = df.filter(start.isNotNull && end.isNotNull)
      .select((gc :+ start.as("__s") :+ end.as("__e")): _*)
    val w = Window.partitionBy(gc: _*).orderBy(col("__s"), col("__e"))
    val flagged = base
      .withColumn("__bad", col("__e") < col("__s"))
      .withColumn("__prev_max",
        max(col("__e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__prev_max").isNull || col("__s") > col("__prev_max"),
          lit(1L)).otherwise(lit(0L)))
      .withColumn("island_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    // fail loud on any malformed interval — assert via a runtime check
    // column that poisons the plan deterministically
    val checked = flagged.withColumn("island_id",
      when(col("__bad"),
        raise_error(concat(lit("mergeIntervals: end < start for start="),
          col("__s").cast("string")))).otherwise(col("island_id")))
    checked
      .groupBy((gc :+ col("island_id")): _*)
      .agg(min(col("__s")).as("start"), max(col("__e")).as("end"),
        count(lit(1)).as("n_intervals"))
  }

  /** Collapse consecutive equal states per group into episodes (the
    * run-length-encoding half): input rows `(group…, order, state)`;
    * output one row per maximal run:
    * `(group…, episode_id, state, n_events, first_ord, last_ord)` with
    * episode_id numbering runs 1..k per group in order. The classic
    * lag-change-flag + cumulative-sum chain — one group-keyed shuffle.
    * NULL states are excluded (a NULL is "no state", not a state). */
  def stateEpisodes(df: DataFrame, group: Seq[String], order: Seq[Column],
                    state: Column): DataFrame = {
    val gc = group.map(col)
    val w = Window.partitionBy(gc: _*).orderBy(order: _*)
    val ordStruct = struct(order: _*)
    df.filter(state.isNotNull)
      .withColumn("__st", state)
      .withColumn("__ord", ordStruct)
      .withColumn("__chg",
        when(lag(col("__st"), 1).over(w).isNull ||
          lag(col("__st"), 1).over(w) =!= col("__st"), lit(1L))
          .otherwise(lit(0L)))
      .withColumn("episode_id",
        sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((gc :+ col("episode_id") :+ col("__st").as("state")): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col("__ord")).as("first_ord"), max(col("__ord")).as("last_ord"))
  }

  /** [[stateEpisodes]] at scale (round 15, VERDICT r14 item 7) — the
    * chunked skew path, the Features.ffillChunked discipline applied to
    * run-length encoding. The plain form's per-group sort window puts a
    * hot key's every row into ONE task (measured 2.02× at 50% skew,
    * BENCH_SF1.md; unbounded at 100 TB). Here the lag-change chain runs
    * inside each (group, chunk) — parallelism per chunk — and episode
    * ids stitch through a per-(group, chunk) SUMMARY (C rows per key):
    *
    *   adj(c)    = local episodes in c − continues(c), where
    *   continues = chunk c's FIRST state equals chunk c−1's LAST state
    *               (that run merges across the boundary);
    *   offset(c) = Σ_{c'<c} adj(c') − continues(c)
    *   global_id = local_id + offset(c)
    *
    * A run spanning chunks lands the SAME (group, global_id, state) on
    * both sides, so the final aggregate merges it exactly — results are
    * IDENTICAL to the plain form (registered against the SAME oracle).
    * `chunk` must be monotone in `order.head` (contiguous time ranges);
    * violations fail LOUD, the [[Features.chunkGuard]] contract. */
  def stateEpisodesChunked(df: DataFrame, group: Seq[String],
                           order: Seq[Column], state: Column,
                           chunk: Column): DataFrame = {
    val gc = group.map(col)
    val CHU = "__sec_chunk"
    val withChunk = df.filter(state.isNotNull)
      .withColumn("__st", state)
      .withColumn("__ord", struct(order: _*))
      .withColumn(CHU, chunk)
    val wLoc = Window.partitionBy((gc :+ col(CHU)): _*).orderBy(col("__ord"))
    val local = withChunk
      .withColumn("__chg",
        when(lag(col("__st"), 1).over(wLoc).isNull ||
          lag(col("__st"), 1).over(wLoc) =!= col("__st"), lit(1L))
          .otherwise(lit(0L)))
      .withColumn("__eid_loc",
        sum(col("__chg")).over(wLoc.rowsBetween(Window.unboundedPreceding, 0)))
    val summ = local.groupBy((gc :+ col(CHU)): _*)
      .agg(min_by(col("__st"), col("__ord")).as("__first_st"),
        max_by(col("__st"), col("__ord")).as("__last_st"),
        max(col("__eid_loc")).as("__n_loc"),
        min(col("__ord")).as("__tmin"), max(col("__ord")).as("__tmax"))
    val wOrd = Window.partitionBy(gc: _*).orderBy(col(CHU))
    val pre = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val carries = summ
      .withColumn("__gchu", col(CHU))
      .withColumn("__cont",
        when(lag(col("__last_st"), 1).over(wOrd) <=> col("__first_st"),
          lit(1L)).otherwise(lit(0L)))
      .withColumn("__off",
        Features.chunkGuard("stateEpisodesChunked", "order.head",
          coalesce(sum(col("__n_loc") - col("__cont")).over(pre), lit(0L)) -
            col("__cont"), wOrd))
      .select((gc :+ col(CHU) :+ col("__off")): _*)
    Features.joinCarry(local, carries, group, CHU, "__off")
      .withColumn("episode_id", col("__eid_loc") + col("__off"))
      .groupBy((gc :+ col("episode_id") :+ col("__st").as("state")): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col("__ord")).as("first_ord"), max(col("__ord")).as("last_ord"))
  }
}
