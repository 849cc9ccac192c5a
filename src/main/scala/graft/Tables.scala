package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet test tables (TESTDATA.md).
  *
  * The driver generates timestamps as parquet `TIMESTAMP(NANOS,
  * isAdjustedToUTC=false)`, which Spark's parquet reader rejects outright
  * ([PARQUET_TYPE_ILLEGAL]). `spark.sql.legacy.parquet.nanosAsLong` reads
  * them as raw Long nanoseconds and [[Tables.events]] converts to
  * TIMESTAMP_NTZ microseconds — the same truncation DuckDB applies when it
  * reads the file, which keeps the differential oracle exact.
  *
  * Micro-second timestamps (lineitem.l_shipdate, orders.o_orderdate) read
  * natively as TIMESTAMP_NTZ and need no conversion.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private def configured(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  /** Raw parquet table, no column rewriting. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    configured(spark).read.parquet(s"$sfDir/$name.parquet")

  /** `events` with `ts` converted ns(Long) → µs TIMESTAMP_NTZ.
    * `ts div 1000` is exact integer division (a Double division would lose
    * sub-µs precision at 1.7e18 ns magnitudes and round differently than
    * DuckDB's own ns→µs truncation).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
