package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop plan capture (round 16, optimization guide §1/§7.2): dump
  * `.explain("formatted")` for the named registered queries to
  * `<outDir>/<name>.txt` — the evidence files behind plan-shape claims
  * (`plans/r16/<name>_before.txt` / `_after.txt`). Session config mirrors Bench so
  * the captured plan is the one the bench actually runs (AQE on, same
  * shuffle partitions, UTC, nanos-as-long).
  *
  * Usage: `runMain graft.Plans <outDir> <query> [query ...]`
  * (`SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS` as in Bench).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val outDir = args.head
    val names = args.tail
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft_warehouse_${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/$name.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plans] wrote $outDir/$name.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plans] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
