package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The reference's ACTUAL database surface — `db_connector.py` — exercised
  * against a real JDBC engine (embedded Apache Derby, shipped with Spark),
  * not a parquet stand-in:
  *
  * | ref (db_connector.py)                      | here |
  * |--------------------------------------------|------|
  * | query → frame (`:110-117`)                 | [[readQuery]] (`query` pushdown — the DB runs the SQL) |
  * | chunked df → table, 1000/500 rows (`:120,137-140,178`) | [[writeTable]] (`batchsize` = executemany chunk) |
  * | TRUNCATE-then-load (`:126-128`)            | [[writeTable]] mode=Overwrite (+`truncate` option) |
  * | ordered full scan (`:168-174`)             | [[readTablePartitioned]] + orderBy caller-side |
  *
  * Derby runs embedded (same JVM) — the right stand-in for the reference's
  * cloud-sql-proxy+MySQL in a zero-egress sandbox: every byte still moves
  * through the real `spark.read/write.format("jdbc")` code path, so the
  * chunking, type-mapping, and overwrite contracts are data-visible.
  *
  * Scale notes: on a cluster the url points at a real server and
  * [[readTablePartitioned]]'s (partitionColumn, bounds, numPartitions)
  * split the scan into concurrent range queries — the standard Spark
  * pattern for parallel JDBC ingest; writes parallelize per-partition
  * with one connection each, `batchsize` rows per round-trip (the
  * reference's executemany chunk, main.py:185-187 / db_connector.py:120).
  */
object Jdbc {

  /** Derby 10.16 embedded driver (lives in derbytools.jar on the Spark
    * classpath). Registered explicitly via the `driver` option — Spark
    * loads it on both driver and executor ends. */
  val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** Embedded-Derby URL for a database directory (created on first use). */
  def derbyUrl(dbDir: String): String = {
    // keep Derby's log out of user.dir; harmless if already set
    if (System.getProperty("derby.stream.error.file") == null)
      System.setProperty("derby.stream.error.file", "/tmp/graft_derby.log")
    s"jdbc:derby:$dbDir;create=true"
  }

  /** df → table in `batchSize`-row chunks (db_connector.py:120,137-140;
    * metrics tables use 500, the generic path 1000, ingest 50). Overwrite
    * replays the reference's TRUNCATE-then-insert (`:126-128`): the
    * `truncate` option truncates in place instead of DROP+CREATE when the
    * table exists, preserving its DDL — exactly the reference's contract. */
  def writeTable(df: DataFrame, url: String, table: String,
                 batchSize: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("driver", DerbyDriver)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .option("truncate", "true")
      .mode(mode)
      .save()

  /** SRC3 — arbitrary SQL → frame (db_connector.py:110-117). The `query`
    * option pushes the statement INTO the database: the DB executes it and
    * Spark reads only the result — projection/filter happen server-side,
    * same as the reference's cursor.execute. */
  def readQuery(spark: SparkSession, url: String, sql: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("driver", DerbyDriver)
      .option("query", sql)
      .load()

  /** Parallel table read: `numPartitions` concurrent range queries over
    * `partitionCol` ∈ [lower, upper] (rows outside the bounds land in the
    * first/last stride — bounds split, never filter). The scan shape for
    * lifting a real DB table into the cluster. */
  def readTablePartitioned(spark: SparkSession, url: String, table: String,
                           partitionCol: String, lower: Long, upper: Long,
                           numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("driver", DerbyDriver)
      .option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()
}
