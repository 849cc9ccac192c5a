package graft

import org.apache.spark.sql.functions._

/** Pins that declarative plans keep their scan-level optimizations
  * through the graft.Tables loaders: filters on stored columns reach the
  * parquet reader as PushedFilters, and column pruning shrinks ReadSchema
  * to the referenced columns — the properties that make a 2-column query
  * over a 100 TB table read 2 columns, not the table. A regression here
  * (e.g. a loader inserting a non-pushable barrier) would silently turn
  * every scan into a full-table read. */
class PushdownSpec extends SparkSpecBase {

  private def scanLine(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("FileScan") || l.contains("PushedFilters") ||
        l.contains("ReadSchema"))
      .mkString("\n")

  test("events: filter on a stored column pushes to the scan; projection prunes ReadSchema") {
    val df = Tables.events(spark, sf0001)
      .filter(col("user_id") === 7)
      .select(col("event_id"), col("user_id"))
    val scan = scanLine(df)
    assert(scan.contains("EqualTo(user_id,7)"), s"filter not pushed:\n$scan")
    assert(scan.contains("event_id") && scan.contains("user_id"),
      s"projected columns missing from scan:\n$scan")
    // the wide columns must be pruned away from the read schema
    Seq("props", "event_type", "value").foreach { c =>
      val read = scan.linesIterator.filter(_.contains("ReadSchema")).mkString
      assert(!read.contains(c), s"column $c not pruned:\n$scan")
    }
  }

  test("documents: a doc_id range predicate pushes through to the parquet reader") {
    val df = Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"))
    val scan = scanLine(df)
    assert(scan.contains("LessThan(doc_id,100)"), s"filter not pushed:\n$scan")
    val read = scan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!read.contains("text"), s"text column not pruned:\n$scan")
  }
}
