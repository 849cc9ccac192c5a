package graft

import java.nio.file.Files

import graft.operators.{Ingest, Sinks}
import graft.streaming.StreamingIngest

/** Pins the streaming path (SURVEY.md §2i): batch parity with the batch
  * ingest, file-source incremental pickup, in-stream key dedup, and the
  * SRC1 pick-first source. */
class StreamingIngestSpec extends SparkSpecBase {

  private def writeCsv(dir: java.io.File, name: String, rows: String): Unit =
    Files.writeString(new java.io.File(dir, name).toPath, rows)

  test("streaming ingest: two files arrive, keyed dedup applies, snapshot upserts incrementally") {
    val landing = Files.createTempDirectory("graft_stream_in").toFile
    val out = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ck").toString
    writeCsv(landing, "b1.csv",
      """2025-01-05,17:00,USD,NFP,high,5.2%,1,2,0,w
        |2025-01-05,17:00,USD,NFP,high,9.9%,1,2,0,w
        |2025-01-06,09:00,EUR,CPI,low,1,2,3,0,w
        |""".stripMargin) // in-file duplicate key: deduped in-stream
    writeCsv(landing, "b2.csv",
      """2025-01-07,10:00,GBP,GDP,medium,4,5,6,0,w
        |""".stripMargin)
    val q = StreamingIngest.run(spark, landing.getAbsolutePath,
      s"$out/events", ckpt)
    q.awaitTermination(120000)
    val snap = Sinks.readSnapshot(spark, s"$out/events")
    val keys = snap.select("Currency", "Event").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(keys === Set(("USD", "NFP"), ("EUR", "CPI"), ("GBP", "GDP")))
    assert(snap.count() === 3) // duplicate USD/NFP key collapsed
  }

  test("streaming ingest to a real JDBC table: micro-batches append through the database, contents match the batch clean") {
    val landing = Files.createTempDirectory("graft_stream_jdbc_in").toFile
    val ckpt = Files.createTempDirectory("graft_stream_jdbc_ck").toString
    val db = Files.createTempDirectory("graft_stream_jdbc_db").toString + "/db"
    writeCsv(landing, "b1.csv",
      """2025-01-05,17:00,USD,NFP,high,5.2%,1,2,0,w
        |2025-01-06,09:00,EUR,CPI,low,1,2,3,0,w
        |""".stripMargin)
    writeCsv(landing, "b2.csv",
      """2025-01-07,10:00,GBP,GDP,medium,4,5,6,0,w
        |""".stripMargin)
    val url = graft.operators.Jdbc.derbyUrl(db)
    val q = StreamingIngest.runToJdbc(spark, landing.getAbsolutePath,
      url, "events_stream", ckpt)
    q.awaitTermination(120000)
    val back = graft.operators.Jdbc.readQuery(spark, url,
      """SELECT "Currency", "Event", "Actual" FROM events_stream""")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(back === Set(("USD", "NFP", "5.2%"), ("EUR", "CPI", "1"),
      ("GBP", "GDP", "4")))
  }

  test("exactly-once JDBC sink: a redelivered micro-batch reads back zero " +
    "duplicates, the ledger records each batch id once, and a FRESH id " +
    "with identical rows still publishes (ledger-keyed, not content-keyed)") {
    import spark.implicits._
    val db = Files.createTempDirectory("graft_eo_jdbc_db").toString + "/db"
    val url = graft.operators.Jdbc.derbyUrl(db)
    val rows = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // batch 0 publishes
    assert(graft.operators.Jdbc.writeBatchExactlyOnce(rows, url,
      "eo_target", batchId = 0L, runId = "s1"))
    def count(): Long = graft.operators.Jdbc.readQuery(spark, url,
      "SELECT CAST(count(*) AS BIGINT) AS n FROM eo_target").head().getLong(0)
    assert(count() === 2L)
    // REDELIVERY of batch 0 (the foreachBatch retry shape — same id,
    // same rows): provable no-op, zero duplicates read back
    assert(!graft.operators.Jdbc.writeBatchExactlyOnce(rows, url,
      "eo_target", batchId = 0L, runId = "s1"))
    assert(count() === 2L)
    // redelivery where the stage was already rewritten (mid-stage crash
    // replay): still a no-op
    assert(!graft.operators.Jdbc.writeBatchExactlyOnce(
      Seq((9L, "z")).toDF("k", "v"), url, "eo_target", batchId = 0L,
      runId = "s1"))
    assert(count() === 2L)
    // a NEW batch id with content identical to batch 0 must publish —
    // exactly-once is per delivered batch, not a content dedup
    assert(graft.operators.Jdbc.writeBatchExactlyOnce(rows, url,
      "eo_target", batchId = 1L, runId = "s1"))
    assert(count() === 4L)
    // a DIFFERENT lineage reusing batch id 0 (checkpoint reset — the
    // round-15 ledger hazard) is NOT a replay: it must publish
    assert(graft.operators.Jdbc.writeBatchExactlyOnce(rows, url,
      "eo_target", batchId = 0L, runId = "s2"))
    assert(count() === 6L)
    // and the same lineage's id 0 is still a no-op after all of that
    assert(!graft.operators.Jdbc.writeBatchExactlyOnce(rows, url,
      "eo_target", batchId = 0L, runId = "s2"))
    assert(count() === 6L)
    // ledger carries exactly the applied (run, id) pairs
    val ids = graft.operators.Jdbc.readQuery(spark, url,
      "SELECT run_id, batch_id FROM eo_target__LEDGER")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ids === Set(("s1", 0L), ("s1", 1L), ("s2", 0L)))
    // end-to-end through the streaming entry point: the checkpointed
    // stream drains into a fresh table exactly once per micro-batch
    val landing = Files.createTempDirectory("graft_eo_stream_in").toFile
    val ckpt = Files.createTempDirectory("graft_eo_stream_ck").toString
    writeCsv(landing, "b1.csv",
      "2025-01-05,17:00,USD,NFP,high,5.2%,1,2,0,w\n")
    writeCsv(landing, "b2.csv",
      "2025-01-06,09:00,EUR,CPI,low,1,2,3,0,w\n")
    val q = StreamingIngest.runToJdbcExactlyOnce(spark,
      landing.getAbsolutePath, url, "eo_stream", ckpt, runId = "st1")
    q.awaitTermination(120000)
    val n1 = graft.operators.Jdbc.readQuery(spark, url,
      "SELECT CAST(count(*) AS BIGINT) AS n FROM eo_stream").head().getLong(0)
    assert(n1 === 2L)
    // restarting the drained stream from the same checkpoint (the
    // recovery path) re-publishes nothing
    val q2 = StreamingIngest.runToJdbcExactlyOnce(spark,
      landing.getAbsolutePath, url, "eo_stream", ckpt, runId = "st1")
    q2.awaitTermination(120000)
    val n2 = graft.operators.Jdbc.readQuery(spark, url,
      "SELECT CAST(count(*) AS BIGINT) AS n FROM eo_stream").head().getLong(0)
    assert(n2 === 2L)
  }

  test("crash-injection, exactly-once publish: a crash AFTER staging " +
    "and a crash DURING staging both leave the target untouched, the " +
    "retry converges with zero duplicates, and no staging rows are " +
    "orphaned") {
    import spark.implicits._
    val db = Files.createTempDirectory("graft_eo_crash_db").toString + "/db"
    val url = graft.operators.Jdbc.derbyUrl(db)
    val rows = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    def count(t: String): Long = graft.operators.Jdbc.readQuery(spark, url,
      s"SELECT CAST(count(*) AS BIGINT) AS n FROM $t").head().getLong(0)

    // (1) crash BETWEEN staging-table load and the ledger transaction:
    // simulate the dead attempt by staging STALE content under a batch-7
    // stage name (the shape a crashed attempt leaves). The retry owns
    // its OWN per-attempt stage (round 15 — a shared name let a zombie
    // attempt's truncate race a replay into committing a partial batch),
    // so it must publish the true rows exactly once; the orphan must
    // never leak into the target, and (round 16) the winning commit
    // RECLAIMS it — per-attempt names otherwise leak one stage table
    // per crashed attempt forever.
    def stage7Tables() = graft.operators.Jdbc.readQuery(spark, url,
      "SELECT tablename FROM SYS.SYSTABLES WHERE tabletype = 'T'")
      .collect().map(_.getString(0))
      .filter(_.startsWith("EO_CRASH__STAGE_7")).toSet
    graft.operators.Jdbc.writeTable(
      Seq((99L, "stale")).toDF("k", "v"), url,
      "eo_crash__STAGE_7_dead0000", batchSize = 500)
    assert(count("eo_crash__STAGE_7_dead0000") === 1L) // the orphan exists
    assert(graft.operators.Jdbc.writeBatchExactlyOnce(rows, url,
      "eo_crash", batchId = 7L, runId = "c1"))
    assert(count("eo_crash") === 2L)
    assert(graft.operators.Jdbc.readQuery(spark, url,
      """SELECT "k" FROM eo_crash""").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L)) // the stale row never leaked into the target
    assert(stage7Tables() === Set.empty[String],
      "the winning commit must reclaim the crashed attempt's orphan stage")
    // replay of the recovered batch is still a no-op
    assert(!graft.operators.Jdbc.writeBatchExactlyOnce(rows, url,
      "eo_crash", batchId = 7L, runId = "c1"))
    assert(count("eo_crash") === 2L)
    // a replay arriving with NEW orphan debris (its own prior crashed
    // attempt) reclaims it on the ledger fast path too
    graft.operators.Jdbc.writeTable(
      Seq((98L, "stale2")).toDF("k", "v"), url,
      "eo_crash__STAGE_7_dead0001", batchSize = 500)
    assert(!graft.operators.Jdbc.writeBatchExactlyOnce(rows, url,
      "eo_crash", batchId = 7L, runId = "c1"))
    assert(stage7Tables() === Set.empty[String],
      "the ledger fast path must reclaim orphan stages of a committed batch")

    // (2) crash DURING the staging write: a poisoned batch whose
    // evaluation throws mid-write. The publish must throw, the target
    // and ledger must be untouched, and the healthy retry must publish
    // exactly once.
    val boom = org.apache.spark.sql.functions.udf { (k: Long) =>
      if (k == 4L) throw new IllegalStateException("injected task failure")
      k
    }
    val poisoned = Seq((3L, "c"), (4L, "d")).toDF("k", "v")
      .withColumn("k", boom(org.apache.spark.sql.functions.col("k")))
    intercept[Exception] {
      graft.operators.Jdbc.writeBatchExactlyOnce(poisoned, url,
        "eo_crash", batchId = 8L, runId = "c1")
    }
    assert(count("eo_crash") === 2L) // target untouched by the failure
    val idsMid = graft.operators.Jdbc.readQuery(spark, url,
      "SELECT batch_id FROM eo_crash__LEDGER")
      .collect().map(_.getLong(0)).toSet
    assert(idsMid === Set(7L)) // no ledger mark for the failed publish
    // the poisoned attempt's partially-staged table is crash debris; the
    // healthy retry owns its own stage, drops it post-commit, AND (round
    // 16) sweeps the poisoned attempt's orphan — a successful publish
    // leaves ZERO stage tables for its batch id
    def stage8Tables() = graft.operators.Jdbc.readQuery(spark, url,
      "SELECT tablename FROM SYS.SYSTABLES WHERE tabletype = 'T'")
      .collect().map(_.getString(0))
      .filter(_.startsWith("EO_CRASH__STAGE_8")).toSet
    assert(graft.operators.Jdbc.writeBatchExactlyOnce(
      Seq((3L, "c"), (4L, "d")).toDF("k", "v"), url,
      "eo_crash", batchId = 8L, runId = "c1"))
    assert(count("eo_crash") === 4L)
    assert(stage8Tables() === Set.empty[String],
      "a successful publish must leave no stage tables for its batch id")
    val ids = graft.operators.Jdbc.readQuery(spark, url,
      "SELECT batch_id FROM eo_crash__LEDGER")
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(7L, 8L))
  }

  test("crash-injection, bucketed upsert: a batch merged into only SOME " +
    "of its buckets (mid-batch crash shape) converges to the clean " +
    "result when the full batch replays") {
    import spark.implicits._
    val base = s"/tmp/graft_test_crash_upsert_${System.nanoTime()}"
    val nBuckets = 8
    def bucketOf(k: Long): Int = {
      import org.apache.spark.sql.functions._
      Seq(k).toDF("k").select(
        pmod(xxhash64(col("k")), lit(nBuckets.toLong)).cast("int"))
        .head().getInt(0)
    }
    // base state: keys 1..6 at ord 1
    val seed = (1L to 6L).map(k => (k, s"v$k", 1L)).toDF("k", "v", "ord")
    graft.operators.Sinks.upsertSnapshotBucketed(spark, s"$base/t", seed,
      Seq("k"), "ord", nBuckets)
    // the batch: update every key to ord 2 — then "crash" after only the
    // buckets of keys 1..3 committed (merge a bucket-complete SUBSET:
    // per-bucket atomicity means a crash can strand any bucket subset,
    // but never a fraction of one bucket)
    val batch = (1L to 6L).map(k => (k, s"w$k", 2L))
    val partialBuckets = batch.filter(r => r._1 <= 3L).map(r => bucketOf(r._1)).toSet
    val partial = batch.filter(r => partialBuckets.contains(bucketOf(r._1)))
    graft.operators.Sinks.upsertSnapshotBucketed(spark, s"$base/t",
      partial.toDF("k", "v", "ord"), Seq("k"), "ord", nBuckets)
    // observable mid-crash state: some keys updated, others not
    val mid = graft.operators.Sinks.readBucketedSnapshot(spark, s"$base/t")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toMap
    assert(partial.forall(r => mid(r._1) === r._2))
    // REPLAY the full batch (the checkpoint redelivery): converges
    graft.operators.Sinks.upsertSnapshotBucketed(spark, s"$base/t",
      batch.toDF("k", "v", "ord"), Seq("k"), "ord", nBuckets)
    val got = graft.operators.Sinks.readBucketedSnapshot(spark, s"$base/t")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet
    // clean-path reference: the same seed + batch on a fresh table
    graft.operators.Sinks.upsertSnapshotBucketed(spark, s"$base/ref", seed,
      Seq("k"), "ord", nBuckets)
    graft.operators.Sinks.upsertSnapshotBucketed(spark, s"$base/ref",
      batch.toDF("k", "v", "ord"), Seq("k"), "ord", nBuckets)
    val ref = graft.operators.Sinks.readBucketedSnapshot(spark, s"$base/ref")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet
    assert(got === ref)
    assert(got === (1L to 6L).map(k => (k, s"w$k")).toSet)
  }

  test("SRC1 pick-first: only the lexicographically first csv is ingested (main.py:116-124)") {
    val dir = Files.createTempDirectory("graft_src1").toFile
    writeCsv(dir, "2025-02.csv", "2025-02-01,10:00,USD,A,low,1,2,3,0,w\n")
    writeCsv(dir, "2025-01.csv", "2025-01-01,10:00,EUR,B,low,1,2,3,0,w\n")
    val rows = Ingest.readFirstCsv(spark, dir.getAbsolutePath).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("Currency") === "EUR") // 2025-01.csv sorts first
  }

  test("streaming bucketed upsert: micro-batches maintain the keyed snapshot, replays idempotent") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = s"/tmp/graft_test_stream_upsert_${System.nanoTime()}"
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
    val stream = in.toDF().toDF("k", "v", "ord")
    def drain(): Unit = {
      val q = graft.streaming.StreamingIngest.runToBucketedSnapshot(
        stream, s"$base/table", s"$base/ckpt", key = Seq("k"),
        orderCol = "ord", nBuckets = 8)
      q.awaitTermination()
    }
    in.addData((1L, "a", 1L), (2L, "b", 1L))
    drain()
    // second trigger: update key 1 (higher ord wins), insert key 3
    in.addData((1L, "a2", 2L), (3L, "c", 1L))
    drain()
    val got = graft.operators.Sinks.readBucketedSnapshot(spark, s"$base/table")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet
    assert(got === Set((1L, "a2"), (2L, "b"), (3L, "c")))
    // replaying the SAME rows (a foreachBatch retry) changes nothing
    in.addData((1L, "a2", 2L), (3L, "c", 1L))
    drain()
    val replay = graft.operators.Sinks.readBucketedSnapshot(spark, s"$base/table")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet
    assert(replay === got)
  }
}
