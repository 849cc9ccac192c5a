package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan auditor (test scope, run via `sbt "Test/runMain
  * graft.tools.PlanCheck"`): prints the physical-plan shape of the
  * queries under active performance work so fixes are verified against
  * the plan, not just the timing. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    val split = graft.operators.Features.chronoSplit(
      graft.Tables.events(spark, dir), Seq("ts", "event_id"))
    val plan = split.queryExecution.executedPlan.toString
    println("=== chronoSplit Window/Exchange/Sort lines ===")
    println(plan.linesIterator
      .filter(l => l.contains("Window") || l.contains("Exchange") || l.contains("Sort"))
      .mkString("\n"))

    val media = graft.operators.Multimodal.synthesizeMixedMedia(spark,
      graft.Tables.documents(spark, dir))
    println("=== decodeMixed partitions: " +
      graft.operators.Multimodal.decodeMixed(spark, media).rdd.getNumPartitions)

    val j = graft.queries.CoreQueries.defs("json_props_extract").fn(spark, dir)
    j.show(5, false)
    spark.stop()
  }
}
