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

  /** EXACTLY-ONCE streaming JDBC publish (round 13 — closes the honest
    * at-least-once caveat of [[graft.streaming.StreamingIngest.runToJdbc]]):
    * the transactional batch-ledger recipe (the Delta-style txn pattern
    * done in plain SQL).
    *
    *  1. fast path: `(runId, batchId)` already in the ledger → no-op (a
    *     replay after a post-commit crash);
    *  2. stage the micro-batch into `<table>__STAGE_<batchId>_<attempt>`
    *     (Overwrite); executors write the stage in parallel, `batchsize`
    *     rows per round-trip. The stage name carries the batch id AND a
    *     per-attempt token (round 15): two concurrent publishers of the
    *     SAME batch (a zombie driver racing its replacement) previously
    *     shared one stage name, so the replay's per-partition Overwrite
    *     could truncate the zombie's fully-staged rows mid-publish and a
    *     PARTIAL batch got committed and ledger-marked — with unique
    *     stages each attempt owns its scratch end to end. A committed (or
    *     raced-out) attempt drops its own stage; a crashed attempt's
    *     orphan is scratch debris, never a correctness issue;
    *  3. ONE driver-side transaction: re-check the ledger (an interleaved
    *     replay may have won), `INSERT INTO table SELECT * FROM stage`,
    *     record `(runId, batchId)` in the ledger, COMMIT.
    *
    * A crash anywhere before the commit leaves the target table and the
    * ledger untouched (the stage is scratch); a crash after it makes the
    * replay a provable no-op. That is exactly-once DELIVERY to the target
    * table, not just at-least-once with dedup — the publish and the mark
    * commit atomically. Spark's checkpointed batch ids are stable across
    * recovery-driven retries, which is what the ledger keys on — BUT only
    * within one query lineage, so the ledger also carries `runId` (round
    * 15, the Delta txn (appId, version) shape): a stream restarted
    * against a deleted checkpoint restarts ids at 0, and a batch_id-only
    * ledger would silently discard every new micro-batch as a "replay";
    * distinct runIds never collide. Two publishers sharing a runId must
    * BE replays of one checkpointed query — that is the caller contract.
    *
    * The target/stage tables are both created by the same Spark JDBC
    * writer schema, so the positional `INSERT … SELECT *` is sound; a
    * pre-existing target with a different column ORDER is a caller
    * contract breach. Returns true iff this call published the batch. */
  def writeBatchExactlyOnce(batch: DataFrame, url: String, table: String,
                            batchId: Long, runId: String,
                            batchSize: Int = 500,
                            ledgerTable: String = ""): Boolean = {
    require(runId.nonEmpty && runId.length <= 64 &&
      runId.matches("[A-Za-z0-9_.-]+"),
      s"runId must be a nonempty [A-Za-z0-9_.-]{1,64} token, got '$runId'")
    val ledger = if (ledgerTable.nonEmpty) ledgerTable else s"${table}__LEDGER"
    val attempt = java.util.UUID.randomUUID().toString.take(8)
    val stage = s"${table}__STAGE_${batchId}_$attempt"
    val conn0 = java.sql.DriverManager.getConnection(url)
    try {
      ensureLedger(conn0, ledger)
      if (ledgerHas(conn0, ledger, runId, batchId)) {
        // replay of a committed batch: the only stages of this batch id
        // that can exist are a crashed prior attempt's orphans — reclaim
        dropSiblingStages(conn0, table, batchId)
        return false
      }
    } finally conn0.close()
    writeTable(batch, url, stage, batchSize, SaveMode.Overwrite)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        if (ledgerHas(conn, ledger, runId, batchId)) { // raced replay:
          conn.rollback()                  // another publisher already won —
          conn.setAutoCommit(true)         // close the txn cleanly and
          dropIfExists(st, stage)          // discard our scratch stage
          return false
        }
        if (!tableExists(conn, table))
          st.executeUpdate(
            s"CREATE TABLE $table AS SELECT * FROM $stage WITH NO DATA")
        st.executeUpdate(s"INSERT INTO $table SELECT * FROM $stage")
        st.executeUpdate(s"INSERT INTO $ledger VALUES ('$runId', $batchId)")
        conn.commit()
        conn.setAutoCommit(true)
        // scratch cleanup — best-effort post-commit: this attempt's own
        // stage AND any crashed/raced-out sibling attempt's orphan (round
        // 16 advice — unique per-attempt stage names fixed the zombie-
        // truncation race but removed the fixed name's self-overwriting
        // reclaim, so orphans of this batch would otherwise leak forever;
        // post-commit is the one moment no live attempt of this batch can
        // still need its stage: any later attempt hits the ledger fast
        // path and never stages)
        dropSiblingStages(conn, table, batchId)
        true
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally st.close()
    } finally conn.close()
  }

  /** Best-effort reclaim of EVERY stage table of `(table, batchId)` —
    * `<table>__STAGE_<batchId>_<attempt>` for any attempt token — via a
    * getTables sweep. getTables' `_` is a single-char wildcard, so the
    * listing is re-filtered against the strict stage-name shape before
    * anything is dropped (a lookalike user table must never be swept).
    * Failures are swallowed: orphan stages are scratch debris, never a
    * correctness issue. */
  private def dropSiblingStages(conn: java.sql.Connection, table: String,
                                batchId: Long): Unit =
    try {
      val (schemaPat, tablePat) = table.split("\\.", 2) match {
        case Array(sch, tab) => (sch.toUpperCase, tab.toUpperCase)
        case _ => (null, table.toUpperCase)
      }
      val strict =
        (java.util.regex.Pattern.quote(tablePat) +
          "__STAGE_" + batchId + "_[A-Za-z0-9-]{1,12}").r
      val rs = conn.getMetaData.getTables(null, schemaPat,
        s"${tablePat}__STAGE_${batchId}_%", null)
      val names = scala.collection.mutable.ListBuffer.empty[String]
      try {
        while (rs.next()) {
          val sch = rs.getString("TABLE_SCHEM")
          val nm = rs.getString("TABLE_NAME")
          if (strict.matches(nm))
            names += (if (sch != null && sch.nonEmpty) s"$sch.$nm" else nm)
        }
      } finally rs.close()
      val st = conn.createStatement()
      try names.foreach(dropIfExists(st, _)) finally st.close()
    } catch { case _: java.sql.SQLException => () }

  /** DROP a scratch table; absent (42Y55) is fine — e.g. a raced replay
    * whose rival already dropped it. Other failures are also swallowed:
    * an orphaned stage is scratch debris, never a correctness issue. */
  private def dropIfExists(st: java.sql.Statement, table: String): Unit =
    try st.executeUpdate(s"DROP TABLE $table")
    catch { case _: java.sql.SQLException => () }

  /** CREATE the (run_id, batch_id) ledger if absent (Derby has no IF NOT
    * EXISTS; SQLState X0Y32 = already there, the expected steady state). */
  private def ensureLedger(conn: java.sql.Connection, ledger: String): Unit = {
    val st = conn.createStatement()
    try st.executeUpdate(
      s"CREATE TABLE $ledger (run_id VARCHAR(64) NOT NULL, " +
        "batch_id BIGINT NOT NULL, PRIMARY KEY (run_id, batch_id))")
    catch {
      case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
    } finally st.close()
  }

  private def ledgerHas(conn: java.sql.Connection, ledger: String,
                        runId: String, batchId: Long): Boolean = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(
        s"SELECT 1 FROM $ledger WHERE run_id = '$runId' " +
          s"AND batch_id = $batchId")
      try rs.next() finally rs.close()
    } finally st.close()
  }

  /** Existence probe honoring schema qualification: `APP2.EVENTS` splits
    * into (schemaPattern, tablePattern) — getTables' third argument is a
    * TABLE pattern, so passing the dotted name whole matches nothing and
    * a pre-existing qualified target would trigger CREATE TABLE → X0Y32
    * → a poison-batch retry loop (round 15). */
  private def tableExists(conn: java.sql.Connection, table: String): Boolean = {
    val (schemaPat, tablePat) = table.split("\\.", 2) match {
      case Array(sch, tab) => (sch.toUpperCase, tab.toUpperCase)
      case _ => (null, table.toUpperCase)
    }
    val rs = conn.getMetaData.getTables(null, schemaPat, tablePat, null)
    try rs.next() finally rs.close()
  }

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
