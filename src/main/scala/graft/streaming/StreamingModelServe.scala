package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.functions.col

import graft.operators.Features

/** Streaming model serve — the inference topology for the trained
  * regression/classifier artifacts (§2i × the model surface), mirroring
  * [[StreamingSimilarity.runIvfServe]]: the model is fitted ONCE in
  * batch and persisted as a parquet frame (the reference's joblib-dump
  * contract, fastapi model/ML Pipeline/train.py:555-567 — retrain
  * republishes wholesale), then an unbounded FEATURE stream is scored
  * per micro-batch by the IDENTICAL batch predict operator inside
  * foreachBatch.
  *
  * Scale shape: the artifact is model-sized (p+1 coefficients, or
  * nRounds stumps), loaded on the driver once at stream start and
  * riding every micro-batch plan as LITERALS — scoring is map-only at
  * scan speed, no join, no shuffle, no state store. The stream can be
  * 100 TB/day; per-row cost is a fixed fold of p multiply-adds.
  *
  * Batch parity is the fidelity contract (StreamingModelServeSpec): the
  * union of per-batch outputs equals the batch predict over the same
  * rows, bit for bit — scoring is per-row, so batch boundaries cannot
  * change any prediction.
  *
  * Delivery: each micro-batch overwrites its own `batch=<runId>-<id>`
  * directory — the idempotent-foreachBatch-sink recipe shared with the
  * ANN serve, so an at-least-once replay replaces its own output instead
  * of appending duplicates, and the caller-owned `runId` namespaces
  * lineages (round 15): a stream restarted against a lost/relocated
  * checkpoint restarts ids at 0 and would otherwise silently overwrite
  * the prior run's accumulated outputs. */
object StreamingModelServe {

  /** Shared runner: score each micro-batch with a batch-identical
    * `score` function into `outDir/batch=<runId>-<id>/`. */
  private def runServe(featureStream: DataFrame,
                       score: DataFrame => DataFrame,
                       outDir: String, checkpointDir: String,
                       runId: String): StreamingQuery = {
    StreamingSimilarity.requireRunId(runId)
    featureStream
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty)
          score(batch).write.mode(SaveMode.Overwrite)
            .parquet(s"$outDir/batch=$runId-$id")
      }
      .start()
  }

  /** Serve a parquet-persisted [[Features.LinearModel]]
    * ([[Features.linearModelToFrame]] layout at `modelDir`) over a
    * feature stream via [[Features.linearPredict]]. */
  def runLinearServe(spark: SparkSession, featureStream: DataFrame,
                     modelDir: String, features: Seq[String],
                     outDir: String, checkpointDir: String, runId: String,
                     outCol: String = "prediction"): StreamingQuery = {
    val model = Features.linearModelFromFrame(spark.read.parquet(modelDir))
    runServe(featureStream,
      b => Features.linearPredict(b, model, features.map(col), outCol),
      outDir, checkpointDir, runId)
  }

  /** Serve a parquet-persisted [[Features.LogisticModel]] over a feature
    * stream via [[Features.logisticPredict]] — P(y=1|x) per row. */
  def runLogisticServe(spark: SparkSession, featureStream: DataFrame,
                       modelDir: String, features: Seq[String],
                       outDir: String, checkpointDir: String, runId: String,
                       outCol: String = "probability"): StreamingQuery = {
    val model = Features.logisticModelFromFrame(spark.read.parquet(modelDir))
    runServe(featureStream,
      b => Features.logisticPredict(b, model, features.map(col), outCol),
      outDir, checkpointDir, runId)
  }

  /** Serve a parquet-persisted [[Features.SgdModel]] (the round-12
    * gradient-trained linear family) over a feature stream via
    * [[Features.sgdPredict]] — raw-double fold, the fit's arithmetic. */
  def runSgdServe(spark: SparkSession, featureStream: DataFrame,
                  modelDir: String, features: Seq[String],
                  outDir: String, checkpointDir: String, runId: String,
                  outCol: String = "prediction"): StreamingQuery = {
    val model = Features.sgdModelFromFrame(spark.read.parquet(modelDir))
    runServe(featureStream,
      b => Features.sgdPredict(b, model, features.map(col), outCol),
      outDir, checkpointDir, runId)
  }

  /** Serve a parquet-persisted [[Features.SoftmaxModel]] over a feature
    * stream via [[Features.sgdSoftmaxPredict]] — per-class probability
    * columns plus the deterministic argmax class per row. */
  def runSoftmaxServe(spark: SparkSession, featureStream: DataFrame,
                      modelDir: String, features: Seq[String],
                      outDir: String, checkpointDir: String,
                      runId: String): StreamingQuery = {
    val model = Features.softmaxModelFromFrame(spark.read.parquet(modelDir))
    runServe(featureStream,
      b => Features.sgdSoftmaxPredict(b, model, features.map(col)),
      outDir, checkpointDir, runId)
  }

  /** Serve a parquet-persisted [[Features.GbmModel]] over a feature
    * stream via [[Features.gbmPredict]] — the boosted-stump fold as plan
    * literals, one `when` chain per round. */
  def runGbmServe(spark: SparkSession, featureStream: DataFrame,
                  modelDir: String, features: Seq[String],
                  outDir: String, checkpointDir: String, runId: String,
                  outCol: String = "prediction"): StreamingQuery = {
    val model = Features.gbmModelFromFrame(spark.read.parquet(modelDir))
    runServe(featureStream,
      b => Features.gbmPredict(b, model, features.map(col), outCol),
      outDir, checkpointDir, runId)
  }

  /** Streaming sibling of the ROUTED pipeline serve (the reference's
    * predict endpoint, main.py:320-391, as an unbounded feed): each
    * micro-batch of feature rows — `(user_id, event_type, pred_f, x2)`,
    * the caller supplies the recent-history lags exactly as the HTTP
    * endpoint is called with recent values — is dispatched per group to
    * its routed family via [[graft.Pipeline.routedScore]] against the
    * three artifacts a `predictor = "routed"` [[graft.Pipeline.run]]
    * persisted under `artifactsDir` (`model_types`,
    * `predictor_params_rnn`, `predictor_params_xgb`). Artifacts load
    * once at stream start (latest snapshot version, all model-sized and
    * broadcast per batch); the identical batch dispatch expression
    * scores every row, so batch parity is structural. */
  def runRoutedServe(spark: SparkSession, featureStream: DataFrame,
                     artifactsDir: String,
                     outDir: String, checkpointDir: String,
                     runId: String): StreamingQuery = {
    // cache(), NOT localCheckpoint (round 15): localCheckpoint blocks
    // live only in executor storage and are non-recomputable — one
    // executor loss mid-stream kills every later micro-batch with a
    // missing-block error. cache keeps the (tiny, model-sized) lineage
    // recomputable; the snapshot read re-runs at worst.
    val modelTypes = graft.operators.Sinks
      .readSnapshot(spark, s"$artifactsDir/model_types").cache()
    val rnnParams = graft.operators.Sinks
      .readSnapshot(spark, s"$artifactsDir/predictor_params_rnn").cache()
    val xgbParams = graft.operators.Sinks
      .readSnapshot(spark, s"$artifactsDir/predictor_params_xgb").cache()
    runServe(featureStream,
      b => graft.Pipeline.routedScore(b, modelTypes, rnnParams, xgbParams),
      outDir, checkpointDir, runId)
  }

  /** Streaming sibling of the SEQ (multi-feature) pipeline serve
    * (round 10): each micro-batch of feature rows — `(user_id,
    * event_type, pred_f, x2, x3, x4)`, the caller supplies recent lags
    * plus the exogenous day features exactly as a prediction endpoint
    * is called — scores against the persisted fitLinearPerGroup
    * artifact via [[graft.Pipeline.seqScore]]. The artifact loads once
    * at stream start (model-sized, broadcast per batch); unknown and
    * ill-conditioned groups keep their naive `pred_f`; the identical
    * batch dispatch expression scores every row, so batch parity is
    * structural. */
  def runSeqServe(spark: SparkSession, featureStream: DataFrame,
                  artifactsDir: String,
                  outDir: String, checkpointDir: String,
                  runId: String): StreamingQuery = {
    val params = graft.operators.Sinks
      .readSnapshot(spark, s"$artifactsDir/predictor_params")
      .cache() // recomputable on executor loss, see runRoutedServe
    runServe(featureStream,
      b => graft.Pipeline.seqScore(b, params),
      outDir, checkpointDir, runId)
  }

  /** Streaming anomaly detection against a persisted robust-statistics
    * artifact (round 9): [[Features.madStats]] is fitted in batch and
    * written to parquet (per-group med2/mad4 — the exact integer
    * encoding), then every micro-batch is flagged by the IDENTICAL
    * batch operator [[Features.madFlag]] — a broadcast join plus
    * map-speed integer arithmetic, no state store, so parity with the
    * batch flagger is structural and replay is idempotent via the
    * shared batch=<id> sink recipe. The monitoring topology: yesterday
    * fits, today's firehose flags. */
  def runMadAnomalyServe(spark: SparkSession, eventStream: DataFrame,
                         statsDir: String, group: Seq[String],
                         valueCol: String, k: Double,
                         outDir: String, checkpointDir: String,
                         runId: String): StreamingQuery = {
    val stats = spark.read.parquet(statsDir)
      .cache() // recomputable on executor loss, see runRoutedServe
    runServe(eventStream,
      b => Features.madFlag(b, stats, group, col(valueCol), k),
      outDir, checkpointDir, runId)
  }
}
