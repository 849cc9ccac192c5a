package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Decontamination, TextAnalysis, UrlCuration}

/** The north-star corpus-curation flow (quality gate → language gate →
  * exact dedup → near-dup candidates) on an UNBOUNDED document stream —
  * the streaming twin of the batch `ext_corpus_curation` query, composed
  * from the pieces that already exist:
  *
  *  - [[TextAnalysis.withCurationGates]]: both gates are one stateless
  *    projection chain (no joins), so they run per-row in any micro-batch
  *    exactly as they do in batch — same formula strings, zero drift.
  *  - [[StreamingDedup.exactDedupStream]]: watermark-bounded first-wins
  *    exact dedup (16-byte keys in state, never text).
  *  - [[StreamingDedup.sketchStream]] → [[StreamingDedup.banded]] →
  *    [[StreamingDedup.candidatePairStream]]: stateful SimHash band
  *    buckets emit near-dup candidate pairs the moment the second doc of
  *    a pair arrives.
  *
  * The deliberate semantic difference vs batch: batch curation REMOVES
  * near-dup losers (it sees the whole corpus); a stream cannot un-emit a
  * survivor, so the near-dup stage emits candidate PAIRS and the
  * downstream consumer (sink merge / compaction job) applies the
  * keep-smallest policy — the standard streaming-dedup architecture.
  * Everything upstream of that (gates + exact dedup) is batch-parity,
  * pinned by StreamingDedupSpec on a replayed corpus.
  *
  * Scale notes: the gates run at scan speed per micro-batch; state is
  * bounded (watermark for exact dedup, MaxBucket × idle-timeout for the
  * band buckets); nothing shuffles document bodies except the curated
  * output itself.
  */
object StreamingCuration {

  /** Gate + exact-dedup front half: curated documents, one per distinct
    * surviving text, with `quality_score` and `lang_predicted` attached.
    * Output is a valid streaming frame (append mode). */
  def curatedStream(docs: DataFrame, tsCol: String, delay: String,
                    minQuality: Double = 0.5, lang: String = "en"): DataFrame =
    StreamingDedup.exactDedupStream(
      TextAnalysis.withCurationGates(docs)
        .filter(col("quality_score") > minQuality &&
          col("lang_predicted") === lang),
      tsCol, delay)

  /** Test-set decontamination as a streaming gate: drop any incoming
    * document sharing ≥ `minShared` word n-grams with the STATIC
    * benchmark set. [[Decontamination.annotateAgainst]] is a stateless
    * projection plus a broadcast stream-static join, so the batch code
    * runs unchanged on the unbounded side — no state, no watermark, and
    * the gate composes anywhere in the curation chain (canonically in
    * front of [[curatedStream]]: leakage should be dropped before it can
    * win an exact-dedup race against a clean duplicate).
    *
    * `benchGrams` must come from [[Decontamination.benchmarkGrams]] (the
    * gram contract travels in its metadata) and SHOULD be `cache()`d by
    * the caller, who owns its lifecycle — a stream-static join
    * re-evaluates its static side every micro-batch, and without the
    * cache the benchmark would be re-tokenized and re-aggregated
    * thousands of times for a byte-identical one-row result. Caller-owned
    * caching (the AsOfJoin pack()/backwardAgainst convention) is what
    * lets a test harness or multi-stream session unpersist the pack when
    * the streams using it stop; the previous form cached internally on
    * every composition and orphaned an entry per rebuilt gate for the
    * life of the session. */
  def decontaminationGate(docs: DataFrame, benchGrams: DataFrame,
                          minShared: Int = 1): DataFrame =
    Decontamination.annotateAgainst(docs, benchGrams, minShared)
      .filter(!col("contaminated"))
      .drop("n_grams", "n_shared", "contaminated")

  /** Quantile-quality gate on a stream, from a TRAINED threshold
    * artifact: `thresholds` comes from
    * [[TextAnalysis.diversityThresholds]] run over a reference corpus (a
    * batch job), and the unbounded side pays only a stateless scoring
    * projection plus a broadcast stream-static join — no state, no
    * watermark, composable anywhere in the chain like
    * [[decontaminationGate]] (whose caller-owns-the-cache convention
    * applies to `thresholds` too). This is the streaming face of
    * [[TextAnalysis.diversityGateWith]] — same code, zero drift. */
  def diversityGate(docs: DataFrame, thresholds: DataFrame,
                    by: String = "lang"): DataFrame =
    TextAnalysis.diversityGateWith(docs, thresholds, by)

  /** CCNet perplexity gate on a stream, from TRAINED artifacts: `model`
    * comes from [[TextAnalysis.lmTrain]] over a reference split (a batch
    * job; bounded driver tables, the BigramLmModel contract) and
    * `thresholds` from [[TextAnalysis.lmPerplexityThresholds]] over a
    * scored reference corpus — both persistable SNK6-style. The
    * unbounded side pays one stateless projection
    * ([[TextAnalysis.lmScoreRowwise]] — the model rides as bounded map
    * literals, no explode/join/aggregate, so ANY output mode works with
    * no watermark) plus the broadcast one-row threshold join of
    * [[TextAnalysis.lmPerplexityGateWith]]. Batch parity is bit-exact
    * and spec-pinned: the rowwise scorer computes the identical
    * quantized-surprisal integers as batch [[TextAnalysis.lmScore]],
    * and the gate applies the identical persisted thresholds — same
    * artifacts, zero drift. Emits the scored+bucketed frame
    * (doc_id, n_bigrams, cost_sum, avg_surprisal_micro, ppl_bucket);
    * filtering to head/middle is caller policy, like [[diversityGate]].
    * The caller-owns-the-cache convention applies to `thresholds`. */
  def perplexityGate(docs: DataFrame, model: TextAnalysis.BigramLmModel,
                     thresholds: DataFrame): DataFrame =
    TextAnalysis.lmPerplexityGateWith(
      TextAnalysis.lmScoreRowwise(docs, model), thresholds)

  /** DSIR importance gate on a stream, from TRAINED artifacts: `model`
    * from [[TextAnalysis.dsirTrain]] over raw+target corpora (a batch
    * job; a B-long driver array) and `threshold` from
    * [[TextAnalysis.dsirThreshold]] over a scored reference corpus —
    * both persistable SNK6-style. The unbounded side pays one stateless
    * projection ([[TextAnalysis.dsirLogWeights]] — hash, array-index,
    * fold; no explode/join/state, any output mode) plus the broadcast
    * one-row threshold join of [[TextAnalysis.dsirGateWith]]. Batch
    * parity is bit-exact by construction (identical integer chain,
    * identical persisted artifacts) and spec-pinned. */
  def dsirGate(docs: DataFrame, model: TextAnalysis.DsirModel,
               threshold: DataFrame): DataFrame =
    TextAnalysis.dsirGateWith(
      TextAnalysis.dsirLogWeights(docs, model), threshold)

  /** URL gate on a stream: [[UrlCuration.normalizeUrls]] +
    * [[UrlCuration.blocklistVerdict]] are ONE stateless projection of
    * built-in string functions — per-row in any output mode, zero
    * state, batch parity by construction (same Column tree). Exact-URL
    * dedup on a stream is [[StreamingDedup.exactDedupStream]] keyed on
    * `url_norm` instead of text — same watermark-bounded state shape. */
  def urlGate(docs: DataFrame, blocked: Seq[String]): DataFrame = {
    val normed = UrlCuration.normalizeUrls(docs)
    normed.withColumn("blocked",
      UrlCuration.blocklistVerdict(col("domain"), blocked))
  }

  /** Gopher rule gate on a stream: [[TextAnalysis.gopherRulesRowwise]]
    * IS the stream shape (one stateless projection, the in-row
    * top-token count) — exposed here so the curation chain names its
    * full gate set in one place. Verdict columns ride along; filtering
    * on `gopher_pass` is caller policy. */
  def gopherGate(docs: DataFrame,
                 p: TextAnalysis.GopherParams): DataFrame =
    TextAnalysis.gopherRulesRowwise(docs, p)

  /** Back half: near-dup candidate pairs among the curated survivors
    * (SimHash sketch → band buckets). Chain this onto [[curatedStream]]'s
    * output for the full flow. `probeBits` per [[StreamingDedup.banded]]:
    * 16 widens the guaranteed-candidate radius from Hamming 3 to 7 at
    * zero extra state — for curation, where misses are silent corpus
    * pollution, the probed form is the production setting. */
  def nearDupCandidates(spark: SparkSession, curated: DataFrame, n: Int,
                        maxDist: Int,
                        probeBits: Int = 16): Dataset[StreamingDedup.CandidatePair] =
    StreamingDedup.candidatePairStream(spark,
      StreamingDedup.banded(spark, StreamingDedup.sketchStream(curated, n),
        probeBits),
      maxDist)

  /** The downstream compaction the scaladoc above promises: apply the
    * batch keep-smallest policy (drop every doc_b of a candidate pair —
    * candidatePairStream already orders docA < docB) to the accumulated
    * curated output. Run periodically over the sink tables; the batch
    * twin of ext_corpus_curation's near-dup removal, closing the
    * streaming flow to the same end state. */
  def keepSmallest(curated: DataFrame,
                   candidates: Dataset[StreamingDedup.CandidatePair]): DataFrame =
    curated.join(
      candidates.select(col("docB").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
}
