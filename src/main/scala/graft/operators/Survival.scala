package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis (Kaplan & Meier 1958) — the time-to-event family
  * (time-to-conversion, churn, failure) with the one thing naive
  * "average days to purchase" gets wrong: CENSORING. A user who hasn't
  * converted yet is not a zero — they are "still at risk", and dropping
  * or zeroing them biases every duration statistic. The KM risk table is
  * the standard fix: at each observed event duration d,
  *   n_at_risk(d) = subjects with duration ≥ d (converted OR censored),
  *   d_events(d)  = subjects converting exactly at d,
  *   factor(d)    = (n_at_risk − d_events) / n_at_risk ,
  * and the survival curve is the running product of factors over
  * ascending d. This operator emits the exact risk TABLE — integer
  * counts plus one exactly-rounded division per step, so the
  * cross-engine differential is exact; the cumulative product is left to
  * the consumer (a running product has no order-free exact form — the
  * deliberate boundary, as with PMI's ln).
  *
  * Scale: one aggregate to the per-duration counts (distinct-duration
  * cardinality — days, not subjects), then per-group ordered windows on
  * that SMALL frame for the at-risk suffix sums. The subject-level
  * shuffle is the groupBy; the window never sees subject rows. */
object Survival {

  /** KM risk table per group over a subject-level frame: `duration`
    * (non-negative integer time units) + `observed` (true = the event
    * happened at `duration`; false = censored at `duration`). Output:
    * `(group…, duration, n_at_risk, d_events, factor)` — one row per
    * OBSERVED event time (censoring times shape n_at_risk but emit no
    * step, the KM convention). */
  def kaplanMeierTable(df: DataFrame, group: Seq[String], duration: Column,
                       observed: Column): DataFrame = {
    val gc = group.map(col)
    val base = df.filter(duration.isNotNull && observed.isNotNull)
      .select((gc :+ duration.as("d") :+ observed.as("obs")): _*)
    val counts = base
      .groupBy((gc :+ col("d")): _*)
      .agg(count(lit(1)).as("n_at_d"),
        sum(when(col("obs"), lit(1L)).otherwise(lit(0L))).as("d_events"))
    val all = Window.partitionBy(gc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val before = Window.partitionBy(gc: _*).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    counts
      .withColumn("__total", sum(col("n_at_d")).over(all))
      .withColumn("__before",
        coalesce(sum(col("n_at_d")).over(before), lit(0L)))
      .withColumn("n_at_risk", col("__total") - col("__before"))
      .filter(col("d_events") > 0) // censoring-only times emit no step
      .select((gc :+ col("d").as("duration") :+ col("n_at_risk") :+
        col("d_events") :+
        ((col("n_at_risk") - col("d_events")).cast("double") /
          col("n_at_risk").cast("double")).as("factor")): _*)
  }
}
