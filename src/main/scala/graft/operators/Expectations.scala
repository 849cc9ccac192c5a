package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (the Deequ/Great-Expectations shape):
  * a suite of expectations evaluated against a table, producing a
  * check-report frame `(check_name, col_name, observed, threshold, passed)` a
  * pipeline gate can assert on — the "don't ship a corrupt partition
  * downstream" control every production ingest needs.
  *
  * Scale design: like [[Profiling.columnProfile]], ONE aggregate per
  * check, unioned — `Uniqueness` needs an exact `count_distinct` and
  * stacking several of those in one aggregate makes Catalyst Expand
  * every row per check (the a11/a13 lesson); independent single-column
  * passes each prune to one column and run as parallel stages. All
  * observed values are ratios of exact longs — engine-portable by
  * construction. Ratio denominators are floored at 1, so an EMPTY
  * table observes 0.0 on every ratio check (fails closed) rather than
  * dividing by zero; pair with `MinCount` when emptiness itself is the
  * condition to surface explicitly.
  */
object Expectations {

  sealed trait Expectation {
    def name: String
    def column: String
    def threshold: Double
    /** (observed, passed) aggregated over the frame. */
    private[Expectations] def observe(df: DataFrame): DataFrame
  }

  /** Fraction of non-null values ≥ threshold. */
  final case class Completeness(column: String, threshold: Double)
      extends Expectation {
    val name = "completeness"
    private[Expectations] def observe(df: DataFrame): DataFrame =
      df.agg((count(col(column)).cast("double") /
        greatest(count(lit(1)), lit(1L)).cast("double")).as("observed"))
  }

  /** Fraction of distinct among non-null values ≥ threshold (1.0 = the
    * column is a key). */
  final case class Uniqueness(column: String, threshold: Double)
      extends Expectation {
    val name = "uniqueness"
    private[Expectations] def observe(df: DataFrame): DataFrame =
      df.agg((count_distinct(col(column)).cast("double") /
        greatest(count(col(column)), lit(1L)).cast("double")).as("observed"))
  }

  /** Fraction of non-null values inside [lo, hi] ≥ threshold. */
  final case class InRange(column: String, lo: Double, hi: Double,
                           threshold: Double) extends Expectation {
    val name = "in_range"
    private[Expectations] def observe(df: DataFrame): DataFrame =
      df.agg((count(when(col(column).between(lo, hi), lit(1)))
        .cast("double") /
        greatest(count(col(column)), lit(1L)).cast("double")).as("observed"))
  }

  /** Fraction of non-null values in the allowed set ≥ threshold. */
  final case class InSet(column: String, allowed: Seq[String],
                         threshold: Double) extends Expectation {
    val name = "in_set"
    private[Expectations] def observe(df: DataFrame): DataFrame =
      df.agg((count(when(col(column).isin(allowed: _*), lit(1)))
        .cast("double") /
        greatest(count(col(column)), lit(1L)).cast("double")).as("observed"))
  }

  /** Row count ≥ threshold (threshold read as a count). */
  final case class MinCount(threshold: Double) extends Expectation {
    val name = "min_count"
    val column = "*"
    private[Expectations] def observe(df: DataFrame): DataFrame =
      df.agg(count(lit(1)).cast("double").as("observed"))
  }

  /** Evaluate the suite: one report row per expectation, `passed` =
    * observed ≥ threshold. The report is tiny (|suite| rows) — the
    * intended use is `require(report.filter(!passed).isEmpty)` as a
    * pipeline gate, or persisting it as a run artifact. */
  def run(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    require(suite.nonEmpty, "empty expectation suite")
    val missing = suite.map(_.column).filter(c => c != "*" &&
      !df.columns.contains(c))
    require(missing.isEmpty, s"expectation columns $missing not in frame")
    suite.map { e =>
      e.observe(df).select(
        lit(e.name).as("check_name"), lit(e.column).as("col_name"),
        col("observed"),
        lit(e.threshold).as("threshold"),
        (col("observed") >= lit(e.threshold)).as("passed"))
    }.reduce(_ unionAll _)
  }
}
