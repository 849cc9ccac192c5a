package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Ingest, Sinks}

/** The reference's incremental semantics (SURVEY.md §2i) as a Structured
  * Streaming path: the batch pipeline is monthly high-watermark append
  * (main.py:161-166) + keyed upsert (main.py:175-188); the streaming
  * equivalent is a file source over the landing prefix → the SAME cleaning
  * chain → event-time watermark → in-stream key dedup → a foreachBatch
  * keyed-upsert sink. Batch parity is the fidelity target: one
  * micro-batch over one CSV produces exactly what Ingest.ingestCsv would.
  *
  * Scale notes: the file source tracks processed files (offsets = the
  * watermark's job in the batch path); `maxFilesPerTrigger` bounds batch
  * size; dropDuplicates state is bounded by the event-time watermark; the
  * upsert inside foreachBatch shuffles only the micro-batch against the
  * snapshot (bucket the snapshot by key at scale).
  */
object StreamingIngest {

  /** readStream → clean → watermark → dedup, ready for a sink. */
  def cleanedStream(spark: SparkSession, landingDir: String,
                    maxFilesPerTrigger: Int = 1): DataFrame = {
    val raw = spark.readStream
      .schema(Ingest.rawSchema)
      .option("header", "false")
      .option("quote", "\"")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(landingDir)
    Ingest.clean(raw)
      // TIMESTAMP (not NTZ) for streaming watermark bookkeeping
      .withColumn("EventTime", col("EventTime").cast("timestamp"))
      .withWatermark("EventTime", "30 days")
      // EventTime MUST be part of the dedup key: the state store only
      // builds a watermark-eviction predicate when the event-time column
      // is in the subset — without it the key state grows forever. It is
      // functionally derived from (Date, Time), so the dedup semantics
      // are unchanged.
      .dropDuplicates("Date", "Time", "Currency", "Event", "EventTime")
  }

  /** Run the stream into a versioned-snapshot upsert sink (SNK1 via
    * foreachBatch). Returns the query; caller awaits/stops it. */
  def run(spark: SparkSession, landingDir: String, tableDir: String,
          checkpointDir: String): StreamingQuery =
    cleanedStream(spark, landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // persist once (round 15): the isEmpty probe is one job over the
        // source scan, and upsertSnapshot references the batch on BOTH
        // sides of its merge — uncached, a micro-batch's files were read
        // up to three times per trigger
        val b = batch.persist()
        try {
          if (!b.isEmpty) {
            Sinks.upsertSnapshot(spark, tableDir, b,
              key = Seq("Date", "Time", "Currency", "Event"),
              orderCol = "EventTime")
            ()
          }
        } finally { b.unpersist(); () }
      }
      .start()

  /** Run the stream into a REAL database table (the reference's actual
    * sink — cleaned events land in MySQL via chunked executemany,
    * main.py:175-188 / db_connector.py:120): each micro-batch appends
    * through `spark.write.jdbc` with the reference's metrics batchsize.
    * In-stream key dedup upstream provides the only-new-rows contract;
    * a server-side unique key (init.sql:20) would back it up in a real
    * deployment. Exactly-once caveat, stated honestly: foreachBatch is
    * at-least-once on retry — a redelivered micro-batch appends twice.
    * [[runToJdbcExactlyOnce]] closes that with the transactional
    * batch-ledger publish; this plain form remains for targets where a
    * server-side unique key already dedups. */
  def runToJdbc(spark: SparkSession, landingDir: String, url: String,
                table: String, checkpointDir: String,
                batchSize: Int = 500): StreamingQuery =
    cleanedStream(spark, landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist() // one scan feeds probe + sink (round 15)
        try {
          if (!b.isEmpty)
            graft.operators.Jdbc.writeTable(b, url, table, batchSize,
              mode = org.apache.spark.sql.SaveMode.Append)
        } finally { b.unpersist(); () }
      }
      .start()

  /** EXACTLY-ONCE stream → JDBC (round 13): each micro-batch publishes
    * through [[graft.operators.Jdbc.writeBatchExactlyOnce]] — stage
    * table + single transaction (INSERT…SELECT + batch-id ledger mark,
    * committed together), so a checkpoint-recovery redelivery of any
    * micro-batch is a provable no-op and the target table never holds a
    * partial batch. Empty batches are skipped (no ledger row needed —
    * replaying an empty batch appends nothing by construction).
    *
    * `runId` names this QUERY LINEAGE in the ledger (round 15): batch
    * ids are only stable within one checkpoint's lifetime, so keep the
    * runId stable across restarts from the same checkpoint and change
    * it when the checkpoint is reset — a fresh lineage's ids restart at
    * 0 and must not collide with the old lineage's ledger rows. */
  def runToJdbcExactlyOnce(spark: SparkSession, landingDir: String,
                           url: String, table: String, checkpointDir: String,
                           runId: String,
                           batchSize: Int = 500): StreamingQuery =
    cleanedStream(spark, landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val b = batch.persist() // one scan feeds probe + stage (round 15)
        try {
          if (!b.isEmpty) {
            graft.operators.Jdbc.writeBatchExactlyOnce(b, url, table,
              batchId = id, runId = runId, batchSize = batchSize)
            ()
          }
        } finally { b.unpersist(); () }
      }
      .start()

  /** Stream → PARTITION-SCOPED upsert: every micro-batch merges into a
    * [[graft.operators.Sinks.upsertSnapshotBucketed]] table, so an
    * unbounded keyed stream maintains a queryable keyed snapshot whose
    * per-batch write cost is O(touched buckets), not O(table) — the
    * streaming face of the SNK1 scale path (a streaming upsert through
    * the full-rewrite `upsertSnapshot` would rewrite the whole table
    * every trigger).
    *
    * Same honest exactly-once caveat as [[runToJdbc]]: foreachBatch is
    * at-least-once on retry; re-merging the same batch is IDEMPOTENT
    * here (same keys → same buckets → same merged rows — last-write-wins
    * on `orderCol` absorbs the replay), which is precisely why
    * upsert-shaped sinks are the recommended foreachBatch target.
    *
    * Atomicity is PER BUCKET, not per trigger: a crash between bucket
    * commits inside one micro-batch leaves that batch partially merged
    * until the checkpoint replays it (at which point the idempotent
    * re-merge converges). Readers needing cross-bucket snapshot
    * consistency should read between triggers or use the versioned
    * [[graft.operators.Sinks.upsertSnapshot]] form. */
  def runToBucketedSnapshot(stream: DataFrame, tableDir: String,
                            checkpointDir: String, key: Seq[String],
                            orderCol: String,
                            nBuckets: Int = 64): StreamingQuery =
    stream
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // no isEmpty pre-probe (round 16): the merge's own touched-bucket
        // collect IS the emptiness probe for an existing table, and the
        // create branch guards itself. No batch.persist either (round
        // 17): the sink's own lazy localCheckpoint of the bucketed batch
        // is the single cache layer every consumer reads — a second
        // persist of the raw rows was a redundant cache fill per batch.
        graft.operators.Sinks.upsertSnapshotBucketed(
          batch.sparkSession, tableDir, batch, key, orderCol, nBuckets)
      }
      .start()

  /** Streaming CDC: an I/U/D changelog stream (the Debezium-consumer
    * shape) maintains a bucketed keyed snapshot via
    * [[graft.operators.Sinks.applyChangesBucketed]] in foreachBatch —
    * the third verb ([[runToBucketedSnapshot]] can insert and update but
    * never remove a key). Same per-bucket atomicity and at-least-once
    * caveats as the upsert form; replaying a micro-batch converges
    * because the per-key collapse rule (latest op in `orderCol` wins) is
    * idempotent — an I→U→D key re-applied still nets to the delete. */
  def runChangesToBucketedSnapshot(changes: DataFrame, tableDir: String,
                                   checkpointDir: String, key: Seq[String],
                                   orderCol: String, opCol: String = "op",
                                   nBuckets: Int = 64): StreamingQuery =
    changes
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // no isEmpty pre-probe (round 16) and no batch.persist (round
        // 17; see runToBucketedSnapshot — the sink's localCheckpoint is
        // the one cache layer)
        graft.operators.Sinks.applyChangesBucketed(
          batch.sparkSession, tableDir, batch, key, orderCol, opCol, nBuckets)
      }
      .start()
}
