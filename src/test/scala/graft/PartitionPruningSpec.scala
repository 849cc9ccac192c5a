package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Pins that a Hive-style date-partitioned layout actually PRUNES: a
  * 3-day filter over a 30-day partitioned table must list and read only
  * the 3 matching partition directories — the property that makes the
  * layout a 10×-IO win at 100 TB instead of a directory-naming cosmetic.
  */
class PartitionPruningSpec extends SparkSpecBase {

  test("date filter over a partitioned write scans only matching partitions") {
    val path = s"/tmp/graft_prune_spec_${ProcessHandle.current().pid()}"
    Tables.events(spark, sf0001)
      .withColumn("event_date", to_date(col("ts")))
      .select(col("event_id"), col("event_type"), col("event_date"))
      .repartition(col("event_date")) // one file per partition dir
      .write.mode("overwrite").partitionBy("event_date").parquet(path)

    val nDates = spark.read.parquet(path)
      .select(col("event_date")).distinct().count()
    assert(nDates > 3, s"fixture degenerate: only $nDates partitions written")

    val pruned = spark.read.parquet(path)
      .filter(col("event_date").between(lit("2024-01-05"), lit("2024-01-07")))
    pruned.collect() // materialize so scan metrics are populated

    val scans = pruned.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"no partition filters on scan:\n${scan.toString}")
    val numFiles = scan.metrics("numFiles").value
    // one part-file per partition dir at this size: 3 days → 3 files
    assert(numFiles == 3,
      s"expected 3 files read (one per matching partition), got $numFiles")
  }
}
