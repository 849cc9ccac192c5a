package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver (BENCH_r{N}.json).
  *
  * Methodology (round-1 fixes):
  *  - full materialization via the `noop` sink — every column is computed
  *    and every operator (sorts, projections) actually executes; a bare
  *    .count() lets Catalyst prune columns and elide work.
  *  - an untimed warmup action first, so the first measured query doesn't
  *    absorb session/codegen/parquet-reader init (~5 s in round 1).
  *  - failures are reported (time −1, listed in "failed"), never silently
  *    recorded as a fast timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warmup: exercise codegen, shuffle machinery, and the parquet reader
    // once, untimed. A warmup failure (bad sfDir) must not kill the run —
    // per-query error reporting below is the honest signal.
    // The lower() touch matters: Spark 4's first case-mapping call runs
    // CollationAwareUTF8String's static init (an ICU titlecase-map build,
    // 6–26 s of CPU observed via jstack), which otherwise lands on
    // whichever measured query calls lower() first — a one-time JVM cost,
    // not that query's throughput.
    try materialize(Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.lower(
        org.apache.spark.sql.functions.col("event_type"))).count())
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { materialize(fn(spark, sfDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (ok) sec else -1.0, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
