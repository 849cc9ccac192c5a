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

  /** Cross-modal alignment gate on a stream:
    * [[graft.operators.Multimodal.alignmentGate]] is ONE stateless pass
    * (typed decode carrying the caption + an integer-exact projection —
    * no join, no state), so the batch operator runs unchanged on an
    * unbounded (doc_id, payload, caption) stream in any output mode;
    * batch parity by construction (same stage tree), spec-pinned. The
    * image-text agreement filter composes with the text gates above —
    * the multimodal leg of the curation chain. */
  def alignmentGate(spark: SparkSession, media: DataFrame): DataFrame =
    graft.operators.Multimodal.alignmentGate(spark, media)

  /** One document offered to a per-source token budget (weight = its
    * token cost); `doc_id` must be arrival-monotone per source — it IS
    * the admission order. */
  final case class BudgetDoc(source: String, doc_id: Long, weight: Long)

  /** The gate's verdict row: the running weight sum INCLUDING this row
    * and whether the row fit (`cum_weight <= budget`). */
  final case class BudgetVerdict(source: String, doc_id: Long, weight: Long,
                                 cum_weight: Long, selected: Boolean)

  /** Streaming token-budget admission — the unbounded face of
    * [[graft.operators.Sampling.selectWithinBudget]]: ingest documents
    * per source until that source's token budget is exhausted, then
    * reject (the "collect B tokens of X" recipe running live). Semantics
    * are the batch operator's greedy PREFIX, not best-fit: the running
    * sum grows by every row seen (selected or not), the first row to
    * cross the budget is excluded, and so is everything after it — no
    * backfill of a smaller later document, so streamed verdicts equal
    * the batch operator run in arrival order (spec-pinned across
    * micro-batch boundaries).
    *
    * State per source: TWO BIGINTs (the weight consumed so far, and the
    * highest doc_id admitted) — bounded by |sources| forever, the
    * streamingCusum state shape. Rows within a micro-batch are
    * processed in (doc_id) order so a batch boundary never reorders
    * admission; arrival-monotone ids are the caller's contract
    * (file-source offsets and event times both give it) — and since
    * round 12 the contract is CHECKED: a later micro-batch delivering a
    * doc_id at or below the source's high-water mark fails LOUDLY
    * instead of silently charging the budget in a different order than
    * the batch operator would (the one way streamed verdicts could
    * diverge from batch parity). */
  def budgetGate(spark: SparkSession, in: Dataset[BudgetDoc],
                 budget: Long): Dataset[BudgetVerdict] = {
    import spark.implicits._
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    in.groupByKey(_.source)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[BudgetDoc],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Long)]) =>
          var (cum, maxSeen) = state.getOption.getOrElse((0L, Long.MinValue))
          val out = rows.toSeq.sortBy(_.doc_id).map { r =>
            require(r.weight >= 0L,
              s"negative weight ${r.weight} for doc ${r.doc_id} " +
                "would un-spend the budget — admission is monotone")
            require(r.doc_id > maxSeen,
              s"source '$source': doc ${r.doc_id} arrived AFTER doc " +
                s"$maxSeen was admitted — doc_id must be arrival-monotone " +
                "per source (the budgetGate contract; see scaladoc). A " +
                "replayed or out-of-order feed would charge the budget in " +
                "a different order than the batch operator.")
            maxSeen = r.doc_id
            cum += r.weight
            BudgetVerdict(source, r.doc_id, r.weight, cum, cum <= budget)
          }
          state.update((cum, maxSeen))
          out.iterator
      }
  }
}
