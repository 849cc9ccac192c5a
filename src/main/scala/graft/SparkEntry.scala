package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, CleaningQueries, CoreQueries, ExtensionQueries, FeatureQueries, JoinQueries, PackingQueries, PipelineQueries, SamplingQueries, SinkQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry lives in graft.queries.*; every entry pairs the Spark
  * implementation with a DuckDB oracle SQL when the semantics are
  * ANSI-expressible (QueryDef.oracle = None → rows-only check + ScalaTest).
  */
object SparkEntry {

  private def all: Map[String, graft.queries.QueryDef] = {
    val maps = Seq(CoreQueries.defs, TpchQueries.defs, ExtensionQueries.defs,
      CleaningQueries.defs, FeatureQueries.defs, PipelineQueries.defs,
      SinkQueries.defs, JoinQueries.defs, SamplingQueries.defs,
      PackingQueries.defs, AnalyticsQueries.defs)
    // A name collision across files would silently SHADOW a query in the
    // ++ merge — the driver would verify one implementation believing it
    // covered the other. Fail loudly instead.
    val dups = maps.flatMap(_.keys).groupBy(identity)
      .collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty, s"duplicate query registrations: ${dups.mkString(", ")}")
    maps.reduce(_ ++ _)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The ROUTED E2E pipeline (round 13 — the richest end-to-end plan):
    * hygiene → group filter → chronological split → lag/fill features →
    * per-group model ROUTING (A2 count-threshold classify steering each
    * group to its model family) → decimal-exact A6 metrics
    * (SURVEY.md §3 E2; graft.Pipeline). */
  def entry(spark: SparkSession): DataFrame =
    all("pipeline_e2e_routed").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (name, q) if q.oracle.isDefined => name -> q.oracle.get }

  /** Two-phase bench registrations (stream rows): untimed fixture build
    * returning the timed run thunk — see QueryDef.phased. */
  def benchPhased: Map[String, (SparkSession, String) => () => DataFrame] =
    all.collect { case (name, q) if q.phased.isDefined => name -> q.phased.get }
}
