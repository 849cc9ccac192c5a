package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet test tables (TESTDATA.md).
  *
  * Through round 6 the driver generated `events.ts` as parquet
  * `TIMESTAMP(NANOS, isAdjustedToUTC=false)`, which Spark's parquet
  * reader rejects outright ([PARQUET_TYPE_ILLEGAL]);
  * `spark.sql.legacy.parquet.nanosAsLong` read them as raw Long
  * nanoseconds and [[Tables.events]] converted to TIMESTAMP_NTZ
  * microseconds — the same truncation DuckDB applies. The round-7 data
  * stores `timestamp[us]` natively (read as TIMESTAMP_NTZ directly), so
  * the loader now dispatches on the ACTUAL column type: Long → the
  * legacy ns→µs conversion, timestamp → a plain NTZ cast. Either vintage
  * of the data serves unchanged.
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

  /** `events` with `ts` normalized to µs TIMESTAMP_NTZ whatever the file
    * stores. Legacy nanos: `ts div 1000` is exact integer division (a
    * Double division would lose sub-µs precision at 1.7e18 ns magnitudes
    * and round differently than DuckDB's own ns→µs truncation).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw // already the target type — no cast, nothing to shift
      case other =>
        // fail LOUD: a session-timezone TimestampType here (e.g.
        // inferTimestampNTZ disabled) cast blindly to NTZ would shift
        // every value by the session offset relative to DuckDB's NTZ
        // read and silently corrupt the differential oracle
        throw new IllegalStateException(
          s"events.ts read as unexpected type $other — expected parquet " +
            "timestamp[us] (TIMESTAMP_NTZ) or legacy nanos-as-Long; if " +
            "Spark read it as session-tz TIMESTAMP, enable " +
            "spark.sql.parquet.inferTimestampNTZ instead of casting")
    }
  }

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
