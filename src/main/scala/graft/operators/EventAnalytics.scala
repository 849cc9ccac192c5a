package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over an events stream: ordered-funnel
  * conversion, cohort retention, and journey-path extraction. These are
  * the workloads the reference's event pipeline feeds downstream BI with
  * (events keyed by user/time — `fastapi model/ML Pipeline/train.py`
  * consumes the same (Currency, Event, EventTime) triple); here they are
  * first-class distributed operators.
  *
  * Scale design (100 TB): every step is either a keyed aggregation or a
  * keyed window — state per user is O(1) (funnel, retention) or O(maxSteps)
  * (journeys); nothing collects to the driver and no operator materializes
  * an unbounded per-user array. All shuffles share the user key, so AQE
  * co-partitions the chain; a pathological hot user is handled by the
  * [[Features.hotKeys]] / pre-split template documented on AsOfJoin.
  */
object EventAnalytics {

  /** Strict event order within a user: (ts, event_id) lexicographic.
    * Struct comparison gives the same total order in Spark and DuckDB
    * (row-value comparison), so ties at equal timestamps are broken
    * identically in both engines. */
  private def ord(tsCol: String, idCol: String) = struct(col(tsCol), col(idCol))

  /** Ordered funnel: how many users reach stage k having passed stages
    * 1..k-1 IN ORDER (each stage's event strictly after the previous
    * stage's first qualifying event — the standard product-analytics
    * funnel, not the unordered "did all of" variant).
    *
    * Returns one row per stage: (stage, stage_name, users).
    *
    * Shape: the base scan is filtered to funnel stages once and lazily
    * checkpointed (each stage frame is consumed twice — by its count and
    * by the next stage's join); stage k is a per-user min-aggregate of
    * stage-k events joined to stage k-1's reach time. k shuffles on the
    * user key for a k-stage funnel, each over an already-small per-user
    * frame — no per-user event arrays, no driver collect.
    */
  def funnel(
      events: DataFrame,
      stages: Seq[String],
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame =
    funnelWindowed(events, stages, maxGapDays = None,
      userCol, typeCol, tsCol, idCol)

  /** [[funnel]] with a CONVERSION WINDOW: stage k's qualifying event
    * must land within `maxGapDays` of stage k−1's reach (strictly after
    * it, as before) — the product-analytics "converted within N days"
    * funnel. Semantics are GREEDY-FROM-FIRST, the standard convention:
    * each stage is reached at its earliest qualifying event given the
    * previous stage's (unique) reach time; an abandoned-then-retried
    * journey that only converts from a LATER stage-1 event does not
    * count. `maxGapDays = None` disables the window (= [[funnel]]). */
  def funnelWindowed(
      events: DataFrame,
      stages: Seq[String],
      maxGapDays: Option[Int],
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame =
    reachFrames(events, stages, maxGapDays, userCol, typeCol, tsCol, idCol)
      .zipWithIndex.map { case (df, i) =>
        df.agg(count(lit(1)).as("users"))
          .select(lit(i + 1).as("stage"), lit(stages(i)).as("stage_name"),
            col("users"))
      }.reduce(_ unionByName _)

  /** Per-user funnel REACH TIMES (round 9): one row per (user, stage
    * reached) with the stage's first-completion order key — the
    * relation [[funnel]]'s counts aggregate away, needed for
    * time-to-convert analytics. Same greedy in-order semantics. */
  def funnelReaches(
      events: DataFrame,
      stages: Seq[String],
      maxGapDays: Option[Int] = None,
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame =
    reachFrames(events, stages, maxGapDays, userCol, typeCol, tsCol, idCol)
      .zipWithIndex.map { case (df, i) =>
        df.select(col(userCol), lit(i + 1).as("stage"),
          lit(stages(i)).as("stage_name"),
          col(s"__reach.$tsCol").as("reach_ts"))
      }.reduce(_ unionByName _)

  /** reached(k) frames, one per stage: per-user first completion of
    * stages 1..k in order (each step inside the conversion window when
    * one is set). */
  private def reachFrames(
      events: DataFrame,
      stages: Seq[String],
      maxGapDays: Option[Int],
      userCol: String, typeCol: String, tsCol: String,
      idCol: String): Seq[DataFrame] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(maxGapDays.forall(_ >= 1), s"maxGapDays must be >= 1: $maxGapDays")
    val base = events
      .filter(col(typeCol).isin(stages: _*))
      .select(col(userCol), col(typeCol), col(tsCol),
        ord(tsCol, idCol).as("__ord"))
      .localCheckpoint(eager = false)

    val first = base.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col("__ord")).as("__reach"))
      .localCheckpoint(eager = false)
    stages.tail.scanLeft(first) { (prev, stage) =>
      val inWindow = maxGapDays match {
        case Some(d) => col(tsCol) <=
          col(s"__reach.$tsCol") + expr(s"INTERVAL $d DAYS")
        case None => lit(true)
      }
      base.filter(col(typeCol) === stage)
        .join(prev, userCol)
        .filter(col("__ord") > col("__reach") && inWindow)
        .groupBy(col(userCol)).agg(min(col("__ord")).as("__reach"))
        .localCheckpoint(eager = false)
    }
  }

  /** Cohort retention: users grouped by the period of their FIRST event
    * (the cohort), counted in each later period they were active.
    *
    * Returns (cohort, period_offset, active_users) where `cohort` is the
    * date-truncated first-activity period (a DATE) and `period_offset`
    * counts whole periods since the cohort period (0 = the cohort period
    * itself).
    *
    * `unit` is "week" (offset = days/7) or "month" (offset = month
    * difference); both truncations land on the same boundary in Spark and
    * DuckDB (ISO Monday weeks / calendar months). Two user-keyed shuffles
    * (first-event agg, activity distinct) + one small groupBy — per-user
    * state is a single timestamp.
    */
  def retentionCohorts(
      events: DataFrame,
      unit: String = "week",
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    require(unit == "week" || unit == "month", s"unsupported unit: $unit")
    val cohorts = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("__first_ts"))
      .select(col(userCol), date_trunc(unit, col("__first_ts")).cast("date").as("cohort"))
    val active = events
      .select(col(userCol), date_trunc(unit, col(tsCol)).cast("date").as("period"))
      .distinct()
    val offset =
      if (unit == "week") expr("datediff(period, cohort) div 7")
      else expr("(year(period) - year(cohort)) * 12 + month(period) - month(cohort)")
    active.join(cohorts, userCol)
      .groupBy(col("cohort"), offset.cast("int").as("period_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** Journey paths: the first `maxSteps` event types per user in strict
    * (ts, id) order, joined into a `a>b>c` path string, then counted
    * across users. The cap bounds per-user state to O(maxSteps) — the
    * collect_list only ever sees rows that survived `rn <= maxSteps`, so
    * a hot user cannot blow up an aggregation buffer at scale.
    *
    * Ordering inside the path does NOT rely on collect_list order (which
    * is partition-nondeterministic): the (rn, type) pairs are sorted
    * after collection, the a18/w4 convention.
    */
  def journeys(
      events: DataFrame,
      maxSteps: Int = 8,
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(maxSteps >= 1, "maxSteps must be >= 1")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol), col(typeCol), row_number().over(w).as("__rn"))
      .filter(col("__rn") <= maxSteps)
      .groupBy(col(userCol))
      .agg(array_join(
        expr(s"transform(array_sort(collect_list(struct(__rn, $typeCol))), x -> x.$typeCol)"),
        ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order Markov transition model over per-user event sequences —
    * the next-event predictor behind "users who did X usually do Y next"
    * (and the maximum-likelihood fit of a Markov chain: transition
    * probability = observed count / source total). Consecutive pairs come
    * from one lag window in strict (ts, id) order per user; sequence
    * boundaries between users are never paired (the window partitions by
    * user).
    *
    * Returns `(src, dst, n, n_src, p, rnk)`: transition count, source
    * row-total, MLE probability (ONE exactly-rounded integer division —
    * hash-stable), and the per-src rank under (n DESC, dst ASC) — a total
    * order, so rnk = 1 IS the deterministic next-event prediction.
    *
    * Scale: one user-keyed window + one aggregate on (src, dst) — state
    * bounded by |states|², not by corpus size; the rank window runs on
    * that |states|²-row frame, never on row data. */
  def markovTransitions(
      events: DataFrame,
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(typeCol).as("dst"),
        lag(col(typeCol), 1).over(w).as("src"))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy(col("src"))
    pairs
      .withColumn("n_src", sum(col("n")).over(totals))
      .withColumn("p", col("n").cast("double") / col("n_src").cast("double"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("n").desc, col("dst"))))
  }
}
