package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-data-pipeline extension surface:
  * per-document statistics, quality scoring, a language-ID heuristic, and
  * content fingerprinting.
  *
  * Everything is a single narrow projection over the document scan — no
  * shuffles, codegen'd built-ins only — so at 100 TB these run at scan
  * speed and column-prune down to (doc_id, text).
  */
object TextAnalysis {

  /** Whitespace tokenisation (the corpus is single-space separated; a
    * production tokenizer would split on `\\s+` and strip punctuation —
    * same plan shape). */
  def toks(text: Column): Column = split(text, " ")

  private val stopwords = graft.functions.TextMetrics.DefaultStopwords

  /** Per-document statistics: lengths, token counts, type/token ratio,
    * stopword ratio, and a BPE-ish subword count (ceil(chars/4) per token —
    * the standard ~4-chars/token heuristic). Ratios are double divisions
    * of exact integers — deterministic in any engine.
    *
    * All six counts come from ONE byte pass per document
    * ([[graft.functions.TextMetrics]] — the composable split/distinct/
    * aggregate/filter form paid an interpreted lambda per token per metric
    * and was the round-2 bench's #3 hotspot); the two-Project shape
    * (produce struct, then extract fields) is what keeps Catalyst from
    * inlining the pass once per output column. */
  def textStats(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("m", call_function("graft_text_metrics", col("text")))
      .select(
        col("doc_id"),
        col("m.n_chars").as("n_chars"),
        col("m.n_tokens").as("n_tokens"),
        col("m.n_uniq_tokens").as("n_uniq_tokens"),
        col("m.n_subword_tokens").as("n_subword_tokens"),
        // nullif denominators (round 15): an empty document has
        // n_chars = 0, and under ANSI (the Spark 4 default) a 0/0
        // double division THROWS — one empty doc aborted the whole
        // stats job. A degenerate doc's ratios are NULL (undefined),
        // never a crash.
        (col("m.n_uniq_tokens").cast("double") /
          nullif(col("m.n_tokens"), lit(0))).as("type_token_ratio"),
        (col("m.n_stopwords").cast("double") /
          nullif(col("m.n_tokens"), lit(0))).as("stopword_ratio"),
        (col("m.n_punct").cast("double") /
          nullif(col("m.n_chars"), lit(0))).as("punct_ratio"))
  }

  // Single source of truth for the quality formula — shared by the batch
  // [[qualityScore]] and the streaming-composable [[withCurationGates]],
  // so the two surfaces can never apply different thresholds.
  // CAST to DOUBLE: a bare `/ 3.0` parses the literal as DECIMAL(2,1)
  // in Spark SQL and the division comes out scale-6 decimal, not the
  // IEEE double any other engine produces.
  private val qualityExpr =
    """CAST(CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1 ELSE 0 END
      |   + CASE WHEN type_token_ratio >= 0.25 THEN 1 ELSE 0 END
      |   + CASE WHEN stopword_ratio >= 0.02 THEN 1 ELSE 0 END
      | AS DOUBLE) / CAST(3.0 AS DOUBLE)""".stripMargin

  /** Quality score in [0,1]: equal-weight components for length-in-range,
    * lexical diversity, and stopword presence — the shape of the
    * reference-free quality filters used on web corpora. Pure integer/CASE
    * arithmetic plus one final double division. */
  def qualityScore(stats: DataFrame): DataFrame =
    stats.withColumn("quality_score", expr(qualityExpr))

  /** Marker-token profiles for the language-ID heuristic. A real n-gram
    * model would score char 3-gram log-likelihoods; the plan shape (one
    * projection, argmax over a small fixed set) is identical. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "fast", "slow"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "et", "les"),
    "es" -> Seq("el", "la", "y", "los"),
    "zh" -> Seq("的", "了", "是"))

  /** Marker scoring + argmax shared by [[langId]] and
    * [[withCurationGates]]: adds `lang_predicted` and `marker_hits` to a
    * frame that already carries a `ws` token-array column (ties broken by
    * language code order, 'und' when nothing matches). */
  private def withLangPrediction(withWs: DataFrame): DataFrame = {
    val scored = langMarkers.toSeq.sortBy(_._1).foldLeft(withWs) {
      case (df, (lang, markers)) =>
        df.withColumn(s"score_$lang",
          size(expr(s"filter(ws, w -> w IN (${markers.map("'" + _ + "'").mkString(",")}))")))
    }
    val langs = langMarkers.keys.toSeq.sorted
    val best = langs.map(l => struct(col(s"score_$l").as("s"), lit(l).as("l")))
    scored
      .withColumn("best", greatest(best: _*))
      .withColumn("lang_predicted",
        when(col("best.s") > 0, col("best.l")).otherwise(lit("und")))
      .withColumn("marker_hits", col("best.s"))
      .drop(langs.map(l => s"score_$l") :+ "best": _*)
  }

  /** Language-ID: score = marker hits per language, predict the argmax
    * (ties broken by language code order), 'und' when nothing matches. */
  def langId(docs: DataFrame): DataFrame =
    withLangPrediction(docs.withColumn("ws", toks(col("text"))))
      .select(col("doc_id"), col("lang").as("lang_actual"),
        col("lang_predicted"), col("marker_hits"))

  /** The curation gates (quality + language) as ONE stateless projection
    * chain over any frame carrying (text, …) — no joins, no shuffles, so
    * the identical chain runs on a batch frame and on an unbounded stream
    * (the batch ext_corpus_curation derives the same numbers via
    * [[textStats]]→[[qualityScore]] and [[langId]]; the formula strings
    * are shared, so the surfaces cannot drift). Adds `quality_score` and
    * `lang_predicted`; every input column is preserved EXCEPT the
    * reserved working names (`m`, `ws`, `n_tokens`, `type_token_ratio`,
    * `stopword_ratio`, `marker_hits`, `best`, `score_<lang>`), which are
    * overwritten internally and dropped — don't feed a frame carrying
    * caller data under those names. */
  def withCurationGates(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    withLangPrediction(
      docs
        .withColumn("m", call_function("graft_text_metrics", col("text")))
        .withColumn("n_tokens", col("m.n_tokens"))
        .withColumn("type_token_ratio",
          col("m.n_uniq_tokens").cast("double") / col("m.n_tokens"))
        .withColumn("stopword_ratio",
          col("m.n_stopwords").cast("double") / col("m.n_tokens"))
        .withColumn("quality_score", expr(qualityExpr))
        .withColumn("ws", toks(col("text"))))
      .drop("m", "ws", "n_tokens", "type_token_ratio", "stopword_ratio",
        "marker_hits")
  }

  /** Content fingerprints: an MD5 of the whitespace-normalized text (the
    * cross-system-stable form) and a 31-base polynomial rolling hash over
    * tokens mod 1e9+7 (the cheap streaming form; word contribution =
    * 131·len + first code point). The hash is the fused single-pass
    * [[graft.functions.TokenRollingHash]] — the per-token interpreted
    * `aggregate` lambda it replaces was the round-2 bench's #2 hotspot. */
  def fingerprints(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("norm", regexp_replace(lower(trim(col("text"))), "\\s+", " "))
      .select(
        col("doc_id"),
        md5(col("norm")).as("content_md5"),
        call_function("graft_rolling_hash", col("norm")).as("rolling_hash"))
  }

  /** Within-document repetition: the fraction of word n-gram OCCURRENCES
    * that repeat an earlier occurrence — the Gopher-style duplicate-n-gram
    * quality gate (machine-generated and boilerplate text scores high;
    * `repetitive` trips when the fraction strictly exceeds `num/den`, an
    * integer-exact comparison with no float boundary).
    *
    * Distinct grams come from [[Dedup.shingles]]' STRING form, not the
    * hashed form — a hash collision would undercount distinct grams and
    * silently diverge from any exact re-derivation; the strings here are
    * per-row transients that never reach an exchange, so the extra width
    * costs nothing at scale. One narrow projection over the scan: no
    * shuffle, prunes to (doc_id, text).
    */
  def repetition(docs: DataFrame, n: Int,
                 num: Int = 1, den: Int = 10): DataFrame = {
    require(n >= 1 && num >= 0 && den >= 1, s"bad params: n=$n, $num/$den")
    docs
      // NULL text reads as the empty document (0 grams, not repetitive) —
      // the Decontamination convention; without the coalesce size(null)=-1
      // would emit (-1, -1, 0.0, false) while an oracle emits NULLs.
      .withColumn("ws", toks(coalesce(col("text"), lit(""))))
      .withColumn("sh", Dedup.shingles("ws", n))
      .select(
        col("doc_id"),
        greatest(size(col("ws")) - (n - 1), lit(0)).as("n_grams_total"),
        size(col("sh")).as("n_grams_distinct"))
      .withColumn("dup_frac",
        when(col("n_grams_total") > 0,
          round(lit(1.0) - col("n_grams_distinct").cast("double") /
            col("n_grams_total"), 6))
          .otherwise(lit(0.0)))
      .withColumn("repetitive",
        (col("n_grams_total") - col("n_grams_distinct")) * den >
          col("n_grams_total") * num)
  }

  /** PII patterns — deliberately RE2-safe (no lookaround, no backrefs,
    * leftmost greedy semantics identical under java.util.regex and RE2)
    * so the exact same pattern strings run in Spark's codegen'd regexp
    * expressions AND in any RE2-based engine (DuckDB, Go, C++) for
    * differential verification. The shapes are the standard web-corpus
    * scrubbing targets: emails, international/US-dashed phone numbers,
    * IPv4 literals. */
  object Pii {
    val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val Phone = "\\+\\d{7,15}|\\b\\d{3}-\\d{3}-\\d{4}\\b"
    val Ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  }

  /** PII scan + redaction: per-doc match counts for each pattern family
    * and the text with every match replaced by a typed placeholder —
    * email → phone → IPv4, a FIXED order (email first: its user part may
    * contain digit runs a later pattern could half-consume; any engine
    * re-deriving the result must apply the same order).
    *
    * Scale: one narrow map-only projection (codegen'd `regexp_count` /
    * `regexp_replace`, no UDFs, no shuffle) — runs at scan speed and
    * column-prunes to (doc_id, text), like every TextAnalysis operator.
    * NULL text reads as the empty document (0 matches, empty redaction)
    * per the Decontamination convention. */
  def piiRedact(docs: DataFrame): DataFrame =
    docs
      .withColumn("t", coalesce(col("text"), lit("")))
      .select(
        col("doc_id"),
        regexp_count(col("t"), lit(Pii.Email)).cast("long").as("n_emails"),
        regexp_count(col("t"), lit(Pii.Phone)).cast("long").as("n_phones"),
        regexp_count(col("t"), lit(Pii.Ipv4)).cast("long").as("n_ips"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("t"), Pii.Email, "[EMAIL]"),
            Pii.Phone, "[PHONE]"),
          Pii.Ipv4, "[IP]").as("redacted"))

  /** Feature hashing (the hashing-vectorizer trick): token → bucket =
    * `hash(token) mod buckets`, per-doc bucket counts ARE the sparse
    * bag-of-words vector — no vocabulary pass, no dictionary artifact to
    * ship, collisions are the accepted trade (buckets sizes the
    * collision rate). One explode + one groupBy on (doc, bucket): the
    * shuffle carries integer keys and counts only, never tokens. `algo`
    * follows the [[Sampling.bucket]] convention — xxh64 production,
    * md5 for the differential oracle. */
  def hashedBagOfWords(docs: DataFrame, buckets: Int, seed: String,
                       algo: String = "xxh64"): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    docs
      .select(col("doc_id"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("token"))
      .withColumn("bucket", Sampling.bucket(col("token"), seed, algo) % buckets)
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** WIDE hashed bag-of-words: one row per doc with `b0..b{buckets-1}`
    * long count columns — the dense-feature shape trained models consume
    * ([[hashedBagOfWords]] is the sparse sibling; identical hashing).
    * One explode + ONE doc_id-keyed aggregation (map-side combined
    * conditional sums, no pivot second pass); every doc keeps a row
    * (split of an empty text yields one "" token). Σ b_i == the raw
    * split token count, so downstream features can use the total without
    * a join back to the text. Intended for SMALL `buckets` (a model's
    * feature width, ≤ a few hundred) — the row stays one cache line per
    * doc and the aggregate is corpus-shaped, never vocabulary-shaped. */
  def hashedBowWide(docs: DataFrame, buckets: Int, seed: String,
                    algo: String = "xxh64"): DataFrame = {
    require(buckets >= 2 && buckets <= 1024,
      s"buckets must be in [2, 1024], got $buckets")
    val cols = (0 until buckets).map(i =>
      sum(when(col("bucket") === i, 1L).otherwise(0L)).as(s"b$i"))
    docs
      .select(col("doc_id"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("token"))
      .withColumn("bucket", Sampling.bucket(col("token"), seed, algo) % buckets)
      .groupBy(col("doc_id"))
      .agg(cols.head, cols.tail: _*)
  }

  /** Lexical diversity in exact parts-per-billion: `n_uniq_tokens ·
    * 1e9 DIV n_tokens` — all-integer (truncating division) so the score,
    * unlike the double `type_token_ratio`, is bit-identical in any
    * engine; quantile thresholds computed over it can never drift on
    * float rounding. */
  // ONE scoring expression shared by diversityScored and
  // diversityGateWith — the threshold artifact is only comparable to
  // scores produced by this exact string
  private val ttrPpbExpr =
    "CAST(m.n_uniq_tokens AS BIGINT) * 1000000000 DIV m.n_tokens"

  private def diversityScored(docs: DataFrame, by: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("m",
        call_function("graft_text_metrics", coalesce(col("text"), lit(""))))
      .select(col(by).as("grp"), col("doc_id"),
        expr(ttrPpbExpr).as("ttr_ppb"))
  }

  /** Quantile-gated quality filter, EXACT form: within each `by` group,
    * drop the lowest `dropFraction` of documents by diversity score —
    * rank-based (`row_number` ordered by score then doc_id, keep
    * `rn > floor(dropFraction · n)`), so the survivor set is a
    * deterministic exact function of the corpus with no interpolation
    * and no float threshold. This is the correctness reference: the
    * per-group sort is the price of exactness, and at corpus scale the
    * production path is [[diversityGateApprox]] (same survivors up to
    * quantile-sketch error, one aggregate + a scan instead of a sort). */
  def diversityGateExact(docs: DataFrame, dropFraction: Double,
                         by: String = "lang"): DataFrame = {
    require(dropFraction >= 0.0 && dropFraction < 1.0,
      s"dropFraction must be in [0,1), got $dropFraction")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("grp").orderBy("ttr_ppb", "doc_id")
    diversityScored(docs, by)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
      .where(col("rn") > floor(col("n") * lit(dropFraction)))
      .select(col("grp"), col("doc_id"), col("ttr_ppb"))
  }

  /** Quantile-gated quality filter, SCALE form: per-group threshold from
    * a single-pass `approx_percentile` sketch (t-digest-style, map-side
    * combinable), broadcast back, then a scan-speed `score > threshold`
    * gate — no per-group sort anywhere, the shape that survives 100 TB.
    * Survivors agree with [[diversityGateExact]] except within the
    * sketch's rank-error band around the cut (DiversityGateSpec pins
    * ≥ 95% agreement on the corpus); strictly-greater comparison means
    * the boundary score itself is dropped, matching the exact gate's
    * treatment of the floor rank. */
  def diversityGateApprox(docs: DataFrame, dropFraction: Double,
                          by: String = "lang",
                          accuracy: Int = 10000): DataFrame =
    diversityGateWith(docs, diversityThresholds(docs, dropFraction, by,
      accuracy), by)

  /** The threshold ARTIFACT of the approx gate: one `(grp, thr)` row per
    * group from a single-pass quantile sketch. Persist it (SNK6-style)
    * and the gate below applies it to any later frame — including an
    * unbounded stream — the train-split→apply asymmetry (J4) for
    * corpus curation. */
  def diversityThresholds(docs: DataFrame, dropFraction: Double,
                          by: String = "lang",
                          accuracy: Int = 10000): DataFrame = {
    require(dropFraction >= 0.0 && dropFraction < 1.0,
      s"dropFraction must be in [0,1), got $dropFraction")
    // dropFraction 0 must keep EVERYTHING (the exact gate's semantics):
    // percentile(0) is the group min and the strict '>' gate would drop
    // every min-scorer, so the no-drop threshold is below any score
    // (ttr_ppb ≥ 0 always)
    val thr =
      if (dropFraction == 0.0) lit(-1L)
      else expr(s"approx_percentile(ttr_ppb, $dropFraction, $accuracy)")
    diversityScored(docs, by).groupBy("grp").agg(thr.as("thr"))
  }

  /** Apply a precomputed threshold frame: scoring is a stateless
    * projection and the join is broadcast — on a stream this is a
    * stream-static join with no state and no watermark, so the SAME gate
    * code curates batch and unbounded corpora (the withCurationGates
    * zero-drift property, extended to a learned artifact). Every input
    * column is preserved, `ttr_ppb` is added (the gate convention);
    * working names `m`, `ttr_ppb`, `__gate_grp`, `thr` are reserved.
    * Groups with NO trained threshold (a language the reference corpus
    * never saw, or a NULL group key) PASS THROUGH ungated — a quality
    * filter must not silently become a group whitelist; drop-unknown is
    * the caller's explicit post-filter if wanted. Cache the thresholds
    * frame caller-side for streams — the static side re-evaluates per
    * micro-batch (the decontaminationGate convention). */
  def diversityGateWith(docs: DataFrame, thresholds: DataFrame,
                        by: String = "lang"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("m",
        call_function("graft_text_metrics", coalesce(col("text"), lit(""))))
      .withColumn("ttr_ppb", expr(ttrPpbExpr))
      .drop("m")
      .join(broadcast(thresholds.withColumnRenamed("grp", "__gate_grp")),
        col(by) === col("__gate_grp"), "left")
      .where(col("thr").isNull || col("ttr_ppb") > col("thr"))
      .drop("__gate_grp", "thr")
  }

  /** First-round BPE merge candidates (Sennrich et al. 2016, the
    * subword-tokenizer training step every LLM pipeline runs before
    * token counting means anything): the top-k adjacent CHARACTER pairs
    * by corpus frequency, where each distinct word contributes its
    * character pairs weighted by the word's corpus count — exactly the
    * statistic the first BPE merge is chosen from. Ranking is total and
    * deterministic: count desc, then (a, b) lexicographic — the
    * tie-break real tokenizer trainers fix by convention so retrainings
    * reproduce the same vocab.
    *
    * Scale design (100 TB): the corpus collapses to the distinct-word
    * vocabulary FIRST (one shuffle with map-side combine on Zipf-shaped
    * word keys); the pair explosion then runs over the VOCAB — millions
    * of rows regardless of corpus size — so the per-round cost of a full
    * BPE training loop built on this is corpus-independent after round
    * one's scan. Single-character words carry no pairs and are filtered
    * before the explode (Spark's descending sequence(1,0) pitfall — see
    * [[Dedup.shingles]]). No end-of-word marker is modeled; counts are
    * raw adjacency. */
  def bpePairCounts(docs: DataFrame, topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    // one definition of "first-round pair counts" (round 15): this is
    // exactly bpeInitialVocab -> bpePairCountsOf — the trainers' own
    // pipeline — plus the rank/topK projection; a second substr-based
    // copy here could silently drift from what training counts
    bpePairCountsOf(bpeInitialVocab(docs))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("a"), col("b"))).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** Curriculum ordering: the deterministic training-order schedule that
    * feeds quality-stratified data round-robin — rank every row by
    * `score` (best first, ties by `id`), cut the ranking into `buckets`
    * equal strata, then emit position r·buckets+b to the r-th best row
    * of stratum b: each "round" of the curriculum sees one row from
    * every stratum, best stratum first (the interleaved curriculum /
    * anti-curriculum literature's standard schedule, made reproducible).
    *
    * Adds `bucket` (0-based stratum) and `position` (1-based global
    * training order). Exact and total — retraining reproduces the same
    * order on any engine (pure integer arithmetic off two total orders).
    *
    * Scale design (100 TB): built on [[Features.withGlobalRowNumber]]'s
    * range-partitioned indexing — TWO range shuffles and two cheap
    * size jobs, NO single-partition global window anywhere (the w5
    * lesson). Stratum membership is arithmetic off the first index
    * (floor((rn−1)·buckets/n)) — no second pass over ntile. */
  def curriculumOrder(df: DataFrame, score: Column, id: String,
                      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val Working = Seq("__cur_neg", "__cur_rn", "__cur_rib")
    val reserved = (Working ++ Seq("bucket", "position"))
      .filter(df.columns.contains)
    require(reserved.isEmpty, s"reserved column names $reserved in input")
    val (ranked, n) = Features.indexedByRange(
      df.withColumn("__cur_neg", -score), Seq("__cur_neg", id),
      "__cur_rn", 0)
    if (n == 0) return df.withColumn("bucket", lit(0L))
      .withColumn("position", lit(0L)).filter(lit(false))
    val strata = ranked
      .withColumn("bucket",
        expr(s"((__cur_rn - 1) * $buckets) div ${n}L"))
      // first rank of stratum b is ceil(b·n/buckets): subtract it to get
      // the within-stratum rank
      .withColumn("__cur_rib",
        expr(s"(__cur_rn - 1) - ((bucket * ${n}L + ${buckets - 1}) div $buckets)"))
    Features.withGlobalRowNumber(strata, Seq("__cur_rib", "bucket"), "position")
      .drop(Working: _*)
  }

  /** Full BPE training (Sennrich et al. 2016): `nMerges` rounds of
    * (count adjacent symbol pairs over the weighted vocab → pick the most
    * frequent, ties count-desc then (a,b) lexicographic → merge it
    * left-to-right greedily in every word). Returns the learned merge
    * table in order — THE tokenizer model — and the final segmented
    * vocab. Training stops early when no pair remains (every word fully
    * merged to one symbol).
    *
    * Determinism: pair counts are exact integers, the argmax tie-break is
    * total, and the greedy left-to-right merge is a fold — retraining
    * reproduces the same table on any engine (the spec differentials it
    * against an independent naive trainer).
    *
    * Scale design (100 TB): the corpus is scanned ONCE (word-count
    * collapse); every round after that is vocabulary-sized — a pair-count
    * aggregate (map-side combine) and a map-only fold applying the merge,
    * with the argmax collected as ONE driver row per round (the k-means
    * seeding convention, corpus-size-independent). Per-round frames are
    * eagerly localCheckpointed: the loop would otherwise stack an
    * unbounded lineage and re-run all prior rounds on each action (the
    * [[Dedup.connectedComponents]] lesson).
    *
    * Delegates to [[bpeTrainBatched]]: one distributed round can emit a
    * whole BATCH of argmax-tied, provably-independent merges (exact — see
    * the soundness note there), cutting driver rounds on the long tied
    * tail without changing the merge table. */
  def bpeTrain(docs: DataFrame, nMerges: Int): (Seq[(String, String, Long)], DataFrame) = {
    val (m, v, _) = bpeTrainBatched(docs, nMerges)
    (m, v)
  }

  /** The one-merge-per-distributed-round trainer — the differential
    * REFERENCE for [[bpeTrainBatched]] (BpeSpec proves the batched merge
    * table identical); not a production entry point. */
  private[graft] def bpeTrainSequential(
      docs: DataFrame, nMerges: Int): (Seq[(String, String, Long)], DataFrame) = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    var vocab = bpeInitialVocab(docs)
    val merges = Seq.newBuilder[(String, String, Long)]
    var round = 0
    var dry = false
    while (round < nMerges && !dry) {
      val best = bpePairCountsOf(vocab).limit(1).collect()
      if (best.isEmpty) dry = true
      else {
        val (a, b) = (best.head.getString(0), best.head.getString(1))
        merges += ((a, b, best.head.getLong(2)))
        val old = vocab
        vocab = vocab.withColumn("syms", mergeOnce(col("syms"), a, b))
          .localCheckpoint()
        old.unpersist()
        round += 1
      }
    }
    (merges.result(), vocab)
  }

  /** Word-count collapse + per-character symbol split — the single
    * corpus-sized pass both trainers share. */
  private def bpeInitialVocab(docs: DataFrame): DataFrame = docs
    .select(explode(toks(coalesce(col("text"), lit("")))).as("w"))
    .filter(length(col("w")) > 0)
    .groupBy(col("w")).agg(count(lit(1)).as("n"))
    .select(expr(
      "transform(sequence(1, length(w)), i -> substr(w, CAST(i AS INT), 1))")
      .as("syms"), col("n"))
    .localCheckpoint()

  /** Adjacent-pair counts over a segmented vocab, sorted by the trainer's
    * total order (cnt desc, a, b). */
  private def bpePairCountsOf(vocab: DataFrame): DataFrame = vocab
    .filter(size(col("syms")) >= 2)
    .select(col("n"), explode(expr(
      """transform(sequence(1, size(syms) - 1),
        |  i -> struct(element_at(syms, CAST(i AS INT)) AS a,
        |              element_at(syms, CAST(i + 1 AS INT)) AS b))"""
        .stripMargin)).as("p"))
    .groupBy(col("p.a").as("a"), col("p.b").as("b"))
    .agg(sum(col("n")).as("cnt"))
    .orderBy(col("cnt").desc, col("a"), col("b"))

  /** BPE training with EXACT batched merge rounds: per distributed
    * pair-count job, emit not just the argmax but the longest prefix of
    * the argmax-TIED candidates that is provably order-independent, then
    * apply the whole batch in one map-only fold. Returns the merge table,
    * the final vocab, and the number of distributed rounds executed
    * (== merges.size for the sequential trainer; ≤ it here).
    *
    * Soundness (why the merge table is IDENTICAL to the sequential
    * trainer's, not merely similar): let C be the round's max count and T
    * the (complete) set of pairs with count C, in (a, b) order. A batch
    * p1..pm — a strict prefix of T — replays the sequential choices iff at
    * each p_i's turn p_i is still the (count desc, a, b) argmax after
    * applying p1..p_{i-1}. Three facts close this:
    *  1. merging pairs can only DECREASE counts of other old pairs (no
    *     adjacency between old symbols is ever created), so no old
    *     non-batch pair can climb past C — and batch members keep count C
    *     exactly when pairwise symbol-disjoint (condition a);
    *  2. a NEW pair (x, s_j) / (s_j, y) around a merged symbol
    *     s_j = a_j+b_j can only reach count C if EVERY merge site shares
    *     that context — which forces the original context pair (x, a_j) /
    *     (b_j, y) to also have count ≥ C, i.e. to be IN T and to share a
    *     symbol with p_j. Requiring that no member of T outside the batch
    *     shares a symbol with any batch member except the LAST (condition
    *     b; the last member's new pairs have nobody left to displace)
    *     therefore caps every new pair strictly below C;
    *  3. new-pair counts could only aggregate with pre-existing counts if
    *     the merged string s_j already names a live symbol — impossible
    *     for the single-character initial symbols (|s_j| ≥ 2) and
    *     driver-checkable against the set of prior merge products
    *     (condition c, again exempting the last member).
    * If T overflows the collected topK window the round conservatively
    * emits the argmax alone — identical to sequential by definition. */
  def bpeTrainBatched(docs: DataFrame, nMerges: Int,
                      topK: Int = 64): (Seq[(String, String, Long)], DataFrame, Int) = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    var vocab = bpeInitialVocab(docs)
    val merges = Seq.newBuilder[(String, String, Long)]
    val products = collection.mutable.Set.empty[String]
    var taken = 0
    var rounds = 0
    var dry = false
    while (taken < nMerges && !dry) {
      val rows = bpePairCountsOf(vocab).limit(topK + 1).collect()
      rounds += 1
      if (rows.isEmpty) dry = true
      else {
        val c = rows.head.getLong(2)
        val tied = rows.takeWhile(_.getLong(2) == c)
          .map(r => (r.getString(0), r.getString(1)))
        // T truncated by the collect window → can't verify condition (b);
        // fall back to the sequential single argmax for this round.
        val tTruncated = rows.length == topK + 1 && rows.last.getLong(2) == c
        val all = if (tTruncated) tied.take(1) else tied
        var m = math.min(if (tTruncated) 1 else all.length,
          nMerges - taken)
        // (a) strict prefix of pairwise symbol-disjoint members
        def syms(p: (String, String)) = Set(p._1, p._2)
        var used = Set.empty[String]
        var i = 0
        while (i < m && (syms(all(i)) & used).isEmpty) {
          used ++= syms(all(i)); i += 1
        }
        m = i
        // (b) no tied member outside the batch shares a symbol with a
        // non-last batch member; (c) non-last products fresh + distinct.
        // m only decreases → fixpoint terminates.
        var changed = true
        while (changed && m > 1) {
          changed = false
          val outside = all.drop(m)
          var j = 0
          while (j < m - 1 && !changed) {
            val s = syms(all(j))
            val prod = all(j)._1 + all(j)._2
            val clash =
              outside.exists(t => (syms(t) & s).nonEmpty) ||
                products.contains(prod) ||
                all.take(m).zipWithIndex.exists { case (t, k) =>
                  k != j && k < m - 1 && t._1 + t._2 == prod }
            if (clash) { m = j + 1; changed = true }
            j += 1
          }
        }
        val batch = all.take(m)
        batch.foreach { case (a, b) =>
          merges += ((a, b, c)); products += (a + b)
        }
        val old = vocab
        vocab = batch.foldLeft(vocab) { case (v, (a, b)) =>
          v.withColumn("syms", mergeOnce(col("syms"), a, b))
        }.localCheckpoint()
        old.unpersist()
        taken += m
      }
    }
    (merges.result(), vocab, rounds)
  }

  /** One greedy left-to-right application of merge (a, b) over a symbol
    * array — the fold both [[bpeTrain]] and [[bpeEncode]] replay, so
    * encoding is BY CONSTRUCTION the training transformation. */
  private def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(lit(a), lit(b)))))
        .otherwise(concat(acc, array(x))))

  /** Encode DISTINCT words with a trained merge table: each word's
    * character sequence runs the merges in training order (nMerges
    * chained map-only folds over a vocab-bounded frame). Input: a frame
    * with a `w` column; output adds `syms array<string>`. */
  def bpeEncodeWords(words: DataFrame,
                     merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(
      words.withColumn("syms", expr(
        "transform(sequence(1, length(w)), i -> substr(w, CAST(i AS INT), 1))"))
    ) { case (df, (a, b)) => df.withColumn("syms", mergeOnce(col("syms"), a, b)) }

  /** BPE ENCODING — the serve half of the tokenizer ([[bpeTrain]] is the
    * train half): apply a trained merge table to every document,
    * returning (doc_id, tokens, n_tokens) with tokens in document order.
    *
    * Scale design (100 TB): encode work is DISTINCT-WORD-sized, never
    * corpus-sized — the distinct words run the merge fold once
    * ([[bpeEncodeWords]], lazily checkpointed so the join consumes one
    * computed copy), then an equi-join puts each word's tokens back on
    * the (doc_id, word-position) stream and a per-doc sort-reassemble
    * emits the stream (the buildIvfIndex collect_list/array_sort
    * convention — collect_list order is nondeterministic, the sort key
    * makes it total). Docs with no words (empty/null text) keep a row
    * with empty tokens — documents never silently vanish. */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col("doc_id"),
        posexplode(toks(coalesce(col("text"), lit("")))).as(Seq("wpos", "w")))
      .filter(length(col("w")) > 0)
    val encoded = bpeEncodeWords(words.select(col("w")).distinct(), merges)
      .localCheckpoint(eager = false)
    val assembled = words.join(encoded, "w")
      .groupBy(col("doc_id"))
      .agg(expr(
        "flatten(transform(array_sort(collect_list(struct(wpos, syms))), s -> s.syms))")
        .as("tokens"))
    docs.select(col("doc_id")).join(assembled, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("tokens"), expr("CAST(array() AS array<string>)"))
          .as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Fixed-size chunking with overlap — the RAG/context-window prep step
    * (LangChain's CharacterTextSplitter shape): every document becomes
    * `1 + ceil(max(0, len - chunkSize) / stride)` chunks of `chunkSize`
    * characters starting every `stride = chunkSize - overlap` characters,
    * with 1-based [start, end] offsets kept so downstream spans map back
    * into the source. The last chunk may be shorter; an empty document
    * yields one empty chunk (documents must never silently vanish in a
    * pipeline — the F8 null-row drop is an explicit, separate gate).
    *
    * Pure integer arithmetic + `substring` over a `posexplode(sequence)`
    * projection: chunk boundaries are engine-exact, and the plan is a
    * map-only explode at scan speed — the explode fan-out is bounded by
    * len/stride, and no shuffle happens until someone aggregates chunks.
    * Chunk rows carry (doc_id, chunk_idx) — the composite key every
    * downstream dedup/embedding stage keys on. */
  def chunkWithOverlap(docs: DataFrame, chunkSize: Int,
                       overlap: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap (chunkSize $chunkSize)")
    val stride = chunkSize - overlap
    docs
      // NULL text reads as the empty document (the file-wide convention
      // — round 15: least() SKIPS nulls, so a null doc previously got a
      // fabricated [1, chunkSize] span with a NULL chunk string)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .select(col("doc_id"), col("text"),
        // ceil((len - chunkSize) / stride) extra chunks past the first;
        // `div` (never `/`, which is double division) keeps it integer-exact
        posexplode(sequence(lit(0L), greatest(lit(0L), expr(
          s"(length(text) - $chunkSize + ${stride - 1}) div $stride")))))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        (col("pos") * stride + 1).cast("long").as("start"),
        least(col("pos") * stride + chunkSize, length(col("text")))
          .cast("long").as("end"),
        expr(s"substring(text, pos * $stride + 1, $chunkSize)").as("chunk"))
  }

  /** Reference-corpus bigram vocabulary: the `topK` word bigrams by
    * occurrence count over `reference`, ties broken lexicographically —
    * a total, engine-stable order. The "language model" of
    * [[bigramCoverage]], collapsed to a frame small enough to broadcast
    * (topK rows, corpus-size-independent — train on 100 TB, serve as a
    * kilobyte table). */
  def bigramVocab(reference: DataFrame, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val grams = reference
      .select(explode(bigrams(col("text"))).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
    // sort-limit plans as TakeOrderedAndProject — per-partition top-K
    // then a K·numPartitions merge (the buildIvfIndex convention), so
    // the rank stage is corpus-size-independent like the output. The
    // round-7 form ranked with row_number over a GLOBAL Window.orderBy,
    // which pulled every distinct corpus bigram into one partition for a
    // serial sort.
    grams.orderBy(col("n").desc, col("bigram")).limit(topK)
      .select(col("bigram"), col("n"))
  }

  /** KenLM-lite quality signal: what fraction of a document's word
    * bigrams appear in a reference vocabulary ([[bigramVocab]]) — the
    * integer-exact stand-in for perplexity-based quality filtering
    * (CCNet/Gopher filter on a reference LM's perplexity; a coverage
    * ratio ranks documents the same way for gating purposes without a
    * single transcendental, so the score is bit-identical across
    * engines). Returns (doc_id, n_bigrams, n_hits, coverage); documents
    * with fewer than 2 tokens score 0/0 → coverage 0.0.
    *
    * Scale shape: explode doc bigrams → broadcast-join the (tiny) vocab →
    * re-aggregate per doc. The explode is the token stream (the corpus
    * itself, once), the join is map-only against a broadcast hash set,
    * and the aggregate combines map-side — no all-corpus shuffle of
    * anything wider than (doc_id, two counts). */
  def bigramCoverage(docs: DataFrame, vocab: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val exploded = docs
      .select(col("doc_id"),
        explode_outer(bigrams(col("text"))).as("bigram"))
    exploded
      .join(broadcast(vocab.select(col("bigram"), lit(1).as("__hit"))),
        Seq("bigram"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("bigram")).as("n_bigrams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hits"))
      .withColumn("coverage",
        when(col("n_bigrams") === 0, lit(0.0))
          .otherwise(col("n_hits").cast("double") /
            col("n_bigrams").cast("double")))
  }

  /** Word bigram array of a text column: adjacent [[toks]] pairs joined
    * with one space; fewer than 2 tokens → empty array. */
  private[operators] def bigrams(text: Column): Column = {
    val ws = toks(text)
    when(size(ws) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(ws, lit(1), size(ws) - 1),
        slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat_ws(" ", a, b)))
  }

  /** Lexical keyword search (round 9) — the sparse-retrieval half of a
    * hybrid search stack: documents scored against a fixed query-term
    * set by integer TF×rarity,
    *   score(d) = Σ_{t ∈ query} tf(t, d) · (10⁶·N_docs div df(t)) ,
    * the BM25/TF-IDF ranking family with the transcendental replaced by
    * an exact integer rarity weight (floor-divided — monotone in 1/df,
    * which is all a RANKING needs; the ext_top_terms log-free lesson).
    * Returns the top `k` as `(doc_id, score, rank)` under the total
    * order (score DESC, doc_id).
    *
    * Scale shape: the token explode is filtered to the query terms AT
    * THE SCAN (an `isin` predicate on a handful of literals — virtually
    * the whole corpus drops before any shuffle); df/N are query-term- and
    * scalar-sized broadcasts; the rank is orderBy+limit =
    * TakeOrderedAndProject (per-partition top-k + driver merge of
    * k·partitions rows, never a global sort). */
  def keywordSearch(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    require(terms.nonEmpty, "keywordSearch needs at least one query term")
    require(k >= 1, s"k must be >= 1, got $k")
    val base = docs.filter(col("text").isNotNull)
    val hits = base
      .select(col("doc_id"), explode(toks(col("text"))).as("t"))
      .filter(col("t").isin(terms: _*))
    val tf = hits.groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val nDocs = base.agg(count(lit(1)).as("n_docs"))
    tf.join(broadcast(dfreq), "t")
      .crossJoin(broadcast(nDocs))
      .withColumn("w", expr("(1000000 * n_docs) div df"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("w")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))).cast("long"))
  }

  /** The SERVABLE half of [[keywordSearch]] (round 9): a persisted
    * inverted postings index `(t, doc_id, tf, df)` built once over the
    * corpus — the artifact an unbounded query stream is answered
    * against (StreamingSimilarity.runHybridServe). `df` rides every
    * posting row so the index is self-describing except for the scalar
    * `n_docs`, which the caller persists alongside (the histBounds
    * grid-contract convention). */
  def buildLexicalIndex(docs: DataFrame): DataFrame = {
    val tf = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(toks(col("text"))).as("t"))
      .groupBy(col("t"), col("doc_id")).agg(count(lit(1)).as("tf"))
    tf.join(tf.groupBy(col("t")).agg(count(lit(1)).as("df")), "t")
  }

  /** Serve [[keywordSearch]] rankings from a prebuilt
    * [[buildLexicalIndex]] for a FRAME of queries `(query_id,
    * terms array<string>)` — identical integer TF×rarity arithmetic
    * (w = 10⁶·n_docs div df), per-query top-k under (score DESC,
    * doc_id). The query side explodes to (query, term) pairs and
    * equi-joins the postings on the term key — per-batch cost scales
    * with the queries' posting lists, never the corpus. */
  def keywordSearchWithIndex(index: DataFrame, nDocs: Long,
                             queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nDocs >= 1, s"nDocs must be >= 1, got $nDocs")
    queries
      .select(col("query_id"), explode(col("terms")).as("t"))
      .distinct() // duplicate query terms score once, as in keywordSearch
      .join(index, Seq("t"))
      .withColumn("w", expr(s"(1000000 * $nDocs) div df"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("tf") * col("w")).as("score"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)
  }

  /** PMI collocation scoring (round 9) — the statistical phrase detector
    * (Church & Hanks 1990; the word2vec phrase-merge preprocessing step):
    * for each adjacent token pair (w₁, w₂), pointwise mutual information
    * compares the pair's observed rate with what independence predicts,
    *   PMI = ln [ p(w₁w₂) / (p(w₁)·p(w₂)) ] ,
    * with p(w₁w₂) = n_pair/N_bigrams and p(w) = n_w/N_tokens. This
    * operator exports the RATIO inside the ln (`score`; PMI = ln(score) —
    * monotone, so every ranking/gating decision is identical) because a
    * transcendental would break bit-stable cross-engine agreement — the
    * ext_top_terms log-free-ranking convention.
    *
    * Exactness: all five counts are exact integers; `is_colloc`
    * (score ≥ threshold) is decided by DECIMAL(38) INTEGER
    * cross-multiplication — 1000·n_pair·N_tok² ≥ milli·N_bi·n_w1·n_w2 —
    * never by comparing doubles; `score` itself is one fixed
    * left-associated IEEE chain, identical in any engine (and exact
    * until products pass 2⁵³ — the gate never relies on it).
    *
    * Scale shape: one token-stream explode each for unigram and bigram
    * counts (map-side-combined aggregates: vocab-sized and
    * distinct-pair-sized outputs), the pair↔unigram joins are against
    * the vocab-sized count frame (AQE broadcasts), totals ride two
    * one-row cross joins. `minPairCount` floors hapax noise before the
    * joins. */
  def collocations(docs: DataFrame, minPairCount: Long,
                   thresholdMilli: Long): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1: $minPairCount")
    require(thresholdMilli >= 1, s"thresholdMilli must be >= 1: $thresholdMilli")
    val toksOf = docs.filter(col("text").isNotNull)
      .select(explode(toks(col("text"))).as("t"))
    val uniCounts = toksOf.groupBy(col("t")).agg(count(lit(1)).as("n_w"))
    val nTok = toksOf.agg(count(lit(1)).as("n_tokens"))
    // two-column pairs straight from rawBigramPairs (round 15): the
    // previous 'w1 w2' string render + regex split per occurrence was
    // wasted work on the token stream, and a second pair representation
    // to keep consistent by hand
    val pairsOf = rawBigramPairs(docs)
      .select(col("w1raw").as("w1"), col("w2raw").as("w2"))
    val nBi = pairsOf.agg(count(lit(1)).as("n_bigrams"))
    val pairCounts = pairsOf
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    pairCounts
      .join(uniCounts.select(col("t").as("w1"), col("n_w").as("n_w1")), "w1")
      .join(uniCounts.select(col("t").as("w2"), col("n_w").as("n_w2")), "w2")
      .crossJoin(nTok).crossJoin(nBi)
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"), col("n_w2"),
        col("n_tokens"), col("n_bigrams"),
        (col("n_pair").cast("double") * col("n_tokens").cast("double") *
          col("n_tokens").cast("double") /
          (col("n_bigrams").cast("double") * col("n_w1").cast("double") *
            col("n_w2").cast("double"))).as("score"),
        (lit(1000L).cast(d38) * col("n_pair").cast(d38) *
          col("n_tokens").cast(d38) * col("n_tokens").cast(d38) >=
          lit(thresholdMilli).cast(d38) * col("n_bigrams").cast(d38) *
            col("n_w1").cast(d38) * col("n_w2").cast(d38)).as("is_colloc"))
  }

  // ------------------------------------------------------------------
  // Reference-LM perplexity filter (CCNet: Wenzek et al. 2020 — score
  // every document by a language model trained on a trusted reference
  // split, then bucket the corpus into head/middle/tail by perplexity
  // and curate on the bucket). The model here is an add-1-smoothed
  // bigram LM over a closed top-K alphabet with <unk> mapping — the
  // smallest model family with real context probabilities (the
  // bigramCoverage row above is the count-only stand-in; this is the
  // actual negative-log-likelihood score).
  //
  // No engine evaluates a transcendental at query time: per-instance
  // surprisal ln((c1+V)/(c12+1)) is computed as a DEFINED quantized
  // chain over exact integers —
  //   r = least((c1+V)·1000 div (c12+1), 1000·2^13)   (milli-ratio)
  //   e = floor(log2(r/1000))  via a 13-branch integer ladder
  //   m = r >> e               (mantissa in [1000, 1999])
  //   cost = e·round(1e6·ln 2) + round(1e6·ln(m/1000))  micro-nats
  // where the 1000-row mantissa table is a data-INDEPENDENT math
  // constant (the Sampling.PoissonCdfMicro convention) shared verbatim
  // with the generated DuckDB oracle, so both engines compute the
  // bit-identical cost. Total quantization error per instance is
  // < 0.0022 nats (1e-3 ratio floor + 1e-3 mantissa floor + table and
  // ln2 rounding) — two decimal digits tighter than any filtering
  // decision, and exactly reproducible.

  /** round(1e6 · ln 2) — the exponent step of the quantized log. */
  val Ln2Micro: Long = 693147L

  /** Saturation cap on the milli-ratio r = 1000·2^13: probabilities
    * below ~1/8192 all score as the cap (≈ 9.01 nats) — a quality
    * filter needs no resolution beyond "vanishingly unlikely", and the
    * cap bounds the exponent ladder at 13 branches. */
  val SurprisalCapMilli: Long = 8192000L

  /** Fixed mantissa log table q(m) = round(1e6 · ln(m/1000)) for
    * m ∈ [1000, 1999]: pure math constants, corpus-independent,
    * embedded as VALUES in the oracle and broadcast as a 1000-row
    * frame in the plan. */
  val LnMantissaMicro: IndexedSeq[(Int, Long)] =
    (1000 to 1999).map(m =>
      (m, math.round(StrictMath.log(m / 1000.0) * 1e6)))

  /** A trained bigram LM, collapsed to driver tables — bounded by the
    * explicit caps (vocabK tokens, ≤ vocabK+1 contexts, lmK bigrams),
    * corpus-size-independent: train on 100 TB, serve as a kilobyte
    * table (the bigramVocab contract). `alphabetSize` = vocabK + 1
    * (vocab ∪ <unk>) is the add-1 smoothing denominator V. */
  final case class BigramLmModel(
      alphabetSize: Int,
      vocab: Seq[String],
      contexts: Seq[(String, Long)],
      bigrams: Seq[(String, String, Long)])

  /** Raw adjacent-token pairs of each document as two columns —
    * the two-column face of [[bigrams]] (which renders "w1 w2"
    * strings); documents with < 2 tokens contribute nothing. */
  private def rawBigramPairs(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), toks(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1))).as("p"))
      .select(col("doc_id"),
        col("p").getField("0").as("w1raw"),
        col("p").getField("1").as("w2raw"))

  /** Close the alphabet: map both sides of every pair into
    * vocab ∪ {<unk>} by two broadcast left joins (no driver literal in
    * the hot path — the vocab frame stays a frame). */
  private def mapToAlphabet(pairs: DataFrame, vocab: DataFrame): DataFrame =
    pairs
      .join(broadcast(vocab.select(col("token").as("w1raw"),
        lit(1).as("__v1"))), Seq("w1raw"), "left")
      .join(broadcast(vocab.select(col("token").as("w2raw"),
        lit(1).as("__v2"))), Seq("w2raw"), "left")
      .select(col("doc_id"),
        when(col("__v1").isNotNull, col("w1raw")).otherwise(lit("<unk>"))
          .as("w1"),
        when(col("__v2").isNotNull, col("w2raw")).otherwise(lit("<unk>"))
          .as("w2"))

  /** Top-`vocabK` reference unigrams under the total order
    * (count DESC, token) — plans as TakeOrderedAndProject, the
    * corpus-size-independent rank (the bigramVocab note). */
  def lmVocab(reference: DataFrame, vocabK: Int): DataFrame = {
    require(vocabK >= 1, s"vocabK must be >= 1, got $vocabK")
    reference.filter(col("text").isNotNull)
      .select(explode(toks(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(vocabK)
      .select(col("token"))
  }

  /** Train the bigram LM on `reference`: alphabet-mapped bigram counts
    * (top `lmK` by count DESC, w1, w2 — a total order) plus FULL
    * per-context counts c1 (no cut: c1 is the smoothing denominator and
    * must cover every context, ≤ vocabK+1 rows by construction). Three
    * bounded collects (vocabK + vocabK+1 + lmK rows) — the accepted
    * model-size driver pattern. */
  def lmTrain(reference: DataFrame, vocabK: Int, lmK: Int): BigramLmModel = {
    require(lmK >= 1, s"lmK must be >= 1, got $lmK")
    val vocabDf = lmVocab(reference, vocabK)
    val vocab = vocabDf.collect().map(_.getString(0)).toSeq
    val spark = reference.sparkSession
    import spark.implicits._
    val vocabLit = vocab.toDF("token")
    val refBg = mapToAlphabet(rawBigramPairs(reference), vocabLit)
    val contexts = refBg.groupBy(col("w1"))
      .agg(count(lit(1)).as("c1"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val bigrams = refBg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .orderBy(col("c12").desc, col("w1"), col("w2")).limit(lmK)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    BigramLmModel(vocabK + 1, vocab, contexts, bigrams)
  }

  /** Score every document under a trained LM: per-doc bigram count and
    * exact BIGINT micro-nat surprisal sum, `avg_surprisal_micro` = one
    * IEEE division (perplexity = exp(avg/1e6), monotone — never
    * materialized). Documents with < 2 tokens (or NULL text) keep
    * n_bigrams = 0 and NULL score.
    *
    * Scale shape: ONE corpus scan → explode to the bigram stream →
    * three broadcast joins (lmK-row LM, ≤V-row contexts, 1000-row
    * mantissa table) → one doc-keyed aggregate with map-side combine.
    * Nothing wider than (doc_id, two longs) ever shuffles. */
  def lmScore(docs: DataFrame, model: BigramLmModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocabLit = model.vocab.toDF("token")
    val lmLit = model.bigrams.toDF("w1", "w2", "c12")
    val ctxLit = model.contexts.toDF("w1", "c1")
    val lnq = LnMantissaMicro.toDF("m", "q")
    val inst = mapToAlphabet(rawBigramPairs(docs), vocabLit)
      .join(broadcast(lmLit), Seq("w1", "w2"), "left")
      .join(broadcast(ctxLit), Seq("w1"), "left")
      .select(col("doc_id"),
        (coalesce(col("c1"), lit(0L)) + lit(model.alphabetSize.toLong))
          .as("num"),
        (coalesce(col("c12"), lit(0L)) + lit(1L)).as("den"))
      .select(col("doc_id"),
        least(expr("num * 1000 div den"), lit(SurprisalCapMilli)).as("r"))
    // e = floor(log2(r/1000)): ascending foldLeft nests so the LARGEST
    // matching exponent is the outermost branch and wins
    val e = (1 to 13).foldLeft(lit(0)) { (acc, k) =>
      when(col("r") >= lit(1000L << k), lit(k)).otherwise(acc)
    }
    val perDoc = inst
      .withColumn("e", e)
      .withColumn("m", expr("cast(shiftright(r, e) as int)"))
      .join(broadcast(lnq), Seq("m"))
      .select(col("doc_id"),
        (col("e").cast("long") * lit(Ln2Micro) + col("q")).as("cost"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("cost")).as("cost_sum"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("cost_sum"),
        (col("cost_sum").cast("double") / col("n_bigrams").cast("double"))
          .as("avg_surprisal_micro"))
  }

  /** CCNet head/middle/tail tertiles over the scored corpus, EXACT
    * form: rank by (avg_surprisal_micro, doc_id) — a total order, the
    * one double compared having come from identical integer chains in
    * both engines — and bucket by exact integer rank arithmetic
    * (3·rn ≤ n / 3·rn ≤ 2n). Unscored documents (no bigrams) label
    * 'unscored'. The global row_number is the W5/diversityGateExact
    * exactness price: at corpus scale, cut at thresholds from a
    * quantile sketch instead ([[lmPerplexityThresholds]]) — same gate,
    * one aggregate, no sort. */
  def lmPerplexityBuckets(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("avg_surprisal_micro").asc, col("doc_id").asc)
    val scoredOnly = scored.filter(col("cost_sum").isNotNull)
    val n = scoredOnly.agg(count(lit(1)).as("__n"))
    val bucketed = scoredOnly
      .withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(n))
      .select(col("doc_id"),
        when(col("rn") * 3 <= col("__n"), lit("head"))
          .when(col("rn") * 3 <= col("__n") * 2, lit("middle"))
          .otherwise(lit("tail")).as("ppl_bucket"))
    scored.join(bucketed, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bigrams"), col("cost_sum"),
        col("avg_surprisal_micro"),
        coalesce(col("ppl_bucket"), lit("unscored")).as("ppl_bucket"))
  }

  /** The SCALE form of the tertile cut: two thresholds from a
    * single-pass quantile sketch over the scores (map-side combinable,
    * no global sort) — persist SNK6-style and gate any later frame,
    * including a stream, with [[lmPerplexityGateWith]]. Agreement with
    * the exact buckets is within the sketch's rank-error band
    * (spec-pinned, the diversityGateApprox contract). */
  def lmPerplexityThresholds(scored: DataFrame,
                             accuracy: Int = 10000): DataFrame =
    scored.filter(col("cost_sum").isNotNull)
      .agg(
        expr(s"approx_percentile(avg_surprisal_micro, 0.33333333, $accuracy)")
          .as("head_max"),
        expr(s"approx_percentile(avg_surprisal_micro, 0.66666667, $accuracy)")
          .as("middle_max"))

  /** Apply persisted thresholds to a scored frame: a broadcast one-row
    * cross join + scan-speed CASE — the stream-static shape. */
  def lmPerplexityGateWith(scored: DataFrame,
                           thresholds: DataFrame): DataFrame =
    scored.crossJoin(broadcast(thresholds))
      .select(col("doc_id"), col("n_bigrams"), col("cost_sum"),
        col("avg_surprisal_micro"),
        when(col("cost_sum").isNull, lit("unscored"))
          .when(col("avg_surprisal_micro") <= col("head_max"), lit("head"))
          .when(col("avg_surprisal_micro") <= col("middle_max"),
            lit("middle"))
          .otherwise(lit("tail")).as("ppl_bucket"))

  /** End-to-end CCNet filter: hash-gate a reference split (deterministic
    * by doc_id — the ext_hash_sample convention), train the bigram LM on
    * it, score the WHOLE corpus, bucket into exact tertiles. */
  def lmPerplexity(docs: DataFrame, vocabK: Int, lmK: Int,
                   refFraction: Double, seed: String,
                   algo: String = "xxh64"): DataFrame = {
    val reference = Sampling.sample(docs, col("doc_id"), refFraction,
      seed, algo)
    lmPerplexityBuckets(lmScore(docs, lmTrain(reference, vocabK, lmK)))
  }

  /** BM25 ranked retrieval (Robertson/Okapi, k1 = 6/5, b = 3/4) over a
    * fixed query-term set — the full-strength sibling of
    * [[keywordSearch]]'s integer TF×rarity: real idf saturation and
    * document-length normalization, still EXACT cross-engine.
    *
    * No transcendental at query time and none in the oracle:
    * idf(t) = ln((N−df+½)/(df+½) + 1) evaluates through the SAME
    * quantized-ln chain as [[lmScore]] (integer milli-ratio
    * (num+den)·1000 div den with num = 2(N−df)+1, den = 2df+1, exponent
    * ladder, [[LnMantissaMicro]]) — driver-side here from the collected
    * per-term dfs (bounded: |terms| ≤ 16 rows), re-derived relationally
    * in the DuckDB oracle from the same corpus counts. The tf side
    * clears k1 = 6/5, b = 3/4 to the integer identity
    *   tf·(k1+1) / (tf + k1(1−b+b·dl/avgdl))
    *     = 44·tf·T / (20·tf·T + 6·T + 18·dl·N)        (avgdl = T/N)
    * so each term's score is ONE IEEE division of two exactly-agreed
    * DECIMAL(38,0) integers (× idf_micro folded into the numerator),
    * and the doc score is the fixed left-assoc sum over the term list —
    * deterministic in any engine.
    *
    * Scale shape: tf counting is per-row higher-order filters (map-only,
    * |terms| bounded scans of each token array); ONE stats aggregate
    * (N, T, per-term df — map-side combinable, |terms|+2 columns out);
    * scoring is a scan-speed projection; top-k plans as
    * TakeOrderedAndProject under the (score DESC, doc_id) total order.
    * Nothing shuffles but the k winners. */
  /** Corpus statistics a BM25 ranking needs, collapsed to a bounded
    * driver artifact (the BigramLmModel contract: fit on 100 TB, serve
    * |terms|+2 numbers): doc count, token count, per-term document
    * frequencies IN TERM ORDER (order defines the tf_i column naming). */
  final case class Bm25Stats(nDocs: Long, totTok: Long,
                             dfs: Seq[(String, Long)])

  private def bm25Terms(st: Bm25Stats): Seq[String] = st.dfs.map(_._1)

  /** Per-doc (doc_id, dl, tf_i...) under a fixed term list — one
    * map-only projection, |terms| bounded higher-order filters per
    * token array. */
  private def bm25TfFrame(docs: DataFrame, terms: Seq[String]): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), toks(col("text")).as("__ws"))
      .withColumn("dl", size(col("__ws")).cast("long"))
      .select(
        col("doc_id") +: col("dl") +: terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("__ws"), w => w === lit(t))).cast("long").as(s"tf_$i")
        }: _*)

  /** Fit the stats artifact: ONE map-side-combinable aggregate over the
    * corpus (N, T, per-term df). */
  def bm25Fit(docs: DataFrame, terms: Seq[String]): Bm25Stats = {
    require(terms.nonEmpty && terms.size <= 16,
      s"terms must be 1..16, got ${terms.size}")
    require(terms.distinct.size == terms.size, "terms must be distinct")
    val withTf = bm25TfFrame(docs, terms)
    val statCols = count(lit(1)).as("__n") +: sum(col("dl")).as("__t") +:
      terms.indices.map(i =>
        sum((col(s"tf_$i") > 0).cast("long")).as(s"__df$i"))
    val st = withTf.agg(statCols.head, statCols.tail: _*).head()
    Bm25Stats(st.getAs[Long]("__n"), st.getAs[Long]("__t"),
      terms.zipWithIndex.map { case (t, i) =>
        t -> st.getAs[Long](s"__df$i") })
  }

  /** Persist/reload face of [[Bm25Stats]] — (term, term_idx, df, n_docs,
    * tot_tok) rows, the SNK6 side-table shape. */
  def bm25StatsToFrame(spark: org.apache.spark.sql.SparkSession,
                       st: Bm25Stats): DataFrame = {
    import spark.implicits._
    st.dfs.zipWithIndex.map { case ((t, df), i) =>
      (t, i, df, st.nDocs, st.totTok)
    }.toDF("term", "term_idx", "df", "n_docs", "tot_tok")
  }

  def bm25StatsFromFrame(df: DataFrame): Bm25Stats = {
    val rows = df.select("term", "term_idx", "df", "n_docs", "tot_tok")
      .collect().sortBy(_.getInt(1))
    require(rows.nonEmpty, "empty bm25 stats frame")
    Bm25Stats(rows.head.getLong(3), rows.head.getLong(4),
      rows.map(r => r.getString(0) -> r.getLong(2)).toSeq)
  }

  /** Score every document under a fitted/persisted stats artifact — a
    * STATELESS projection (the serve/stream shape: no aggregate, no
    * join; legal in any streaming output mode), emitting
    * (doc_id, dl, tf_i..., score). idf evaluates driver-side through
    * the [[lmScore]] quantized-ln chain; each term's contribution is
    * one IEEE division of exactly-agreed DECIMAL(38,0) integers; the
    * doc score is the fixed left-assoc term sum. Docs containing no
    * query term score 0.0 (kept — gating is caller policy). */
  def bm25ScoreWith(docs: DataFrame, st: Bm25Stats): DataFrame = {
    val d38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val terms = bm25Terms(st)
    val idfMicro = st.dfs.map { case (_, df) =>
      val num = 2L * (st.nDocs - df) + 1L
      val den = 2L * df + 1L
      quantCost(math.min((num + den) * 1000L / den, SurprisalCapMilli))
    }
    val score = terms.indices.foldLeft(lit(0.0)) { (acc, i) =>
      val tf = col(s"tf_$i")
      val num = lit(idfMicro(i)).cast(d38) * lit(44L).cast(d38) *
        tf.cast(d38) * lit(st.totTok).cast(d38)
      val den = lit(20L).cast(d38) * tf.cast(d38) * lit(st.totTok).cast(d38) +
        lit(6L * st.totTok).cast(d38) +
        lit(18L * st.nDocs).cast(d38) * col("dl").cast(d38)
      acc + when(tf > 0, num.cast("double") / den.cast("double"))
        .otherwise(lit(0.0))
    }
    // serve keeps EVERY document (gating is caller policy — round 15:
    // the tf frame's isNotNull filter silently dropped null-text rows
    // from the output): a null text reads as the empty document, whose
    // tfs are all zero and whose score is exactly 0.0. Fit semantics
    // are untouched — stats still come from non-null docs only.
    bm25TfFrame(docs.withColumn("text", coalesce(col("text"), lit(""))),
      terms).withColumn("score", score)
  }

  def bm25Search(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    bm25ScoreWith(docs, bm25Fit(docs, terms))
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Driver-side twin of [[lmScore]]'s quantized chain: the 13-branch
    * exponent ladder collapses to floor(log2(r/1000)) via
    * numberOfLeadingZeros (equivalent on r ∈ [1000, 2^13·1000] — for r
    * in [1000·2^k, 1000·2^(k+1)), floor(r/1000) ∈ [2^k, 2^(k+1))), then
    * the SAME [[Ln2Micro]]/[[LnMantissaMicro]] constants. Keeping one
    * definition of the runtime chain and one of the driver chain, each
    * spec-pinned against the other, is what lets [[lmCostTables]]
    * pre-evaluate every reachable cost exactly. */
  private def quantCost(r: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(r / 1000)
    val m = (r >> e).toInt
    e * Ln2Micro + LnMantissaMicro(m - 1000)._2
  }

  /** Row-wise sibling of [[lmScore]]: bit-identical output (spec-pinned)
    * from a SINGLE stateless projection — no explode, no join, no
    * doc-keyed aggregate. A scored instance's cost is a pure function of
    * (w1, w2) under the model — known bigram → cost from (c1, c12);
    * known context, unknown bigram → den = 1; unknown context →
    * num = V, den = 1 — so every reachable cost is pre-evaluated
    * driver-side over the ≤ lmK + V + 1 inputs (exact Long arithmetic:
    * `/` on positive Longs IS the oracle's `div`) and query-time
    * scoring is pure lookup.
    *
    * Lookup layout (the per-pair cost must not pay a linear string-map
    * scan — measured 5.7× over [[lmScore]] at sf0.1 in the naive
    * string-keyed form): tokens map to dense int ids through ONE
    * ≤ vocabK string map probe per token, then each pair costs one
    * long-keyed map probe (id1·V + id2 — collision-free by id range)
    * with an O(1) context-cost ARRAY fallback indexed by id1. A corpus
    * token literally spelled "<unk>" that wins a vocab slot collapses
    * into the placeholder in every path (train, batch score, oracle) —
    * the id mapping preserves that quirk by reusing its vocab id as the
    * unknown id.
    *
    * This is the SERVE/STREAM shape: with zero wide dependencies it is
    * legal in any Structured Streaming output mode with no watermark or
    * state, and at batch scale it trades [[lmScore]]'s one (doc_id,
    * long, long) shuffle for bounded in-row probes. */
  def lmScoreRowwise(docs0: DataFrame, model: BigramLmModel): DataFrame = {
    // CPU-dense per row (map-literal lookups per token) over what is a
    // single scan split at small corpus sizes — spread first (round 16,
    // guide §2.5; no-op when the scan is already cluster-wide)
    val docs = Dedup.spread(docs0)
    val v = model.alphabetSize
    val ctx = model.contexts.toMap
    def cost(num: Long, den: Long): Long =
      quantCost(math.min(num * 1000L / den, SurprisalCapMilli))
    val defaultCost = cost(v.toLong, 1L)
    val idx: Map[String, Int] = model.vocab.zipWithIndex.toMap
    val unkId = idx.getOrElse("<unk>", v - 1)
    def tokenId(t: String): Int = idx.getOrElse(t, unkId)
    // context costs as an id-indexed array: O(1) per pair
    val ctxArr = Array.fill(v)(defaultCost)
    model.contexts.foreach { case (w1, c1) =>
      ctxArr(tokenId(w1)) = cost(c1 + v.toLong, 1L)
    }
    // bigram costs keyed id1·V + id2: long compares, no string concat
    val bgCostL: Map[Long, Long] = model.bigrams.map { case (w1, w2, c12) =>
      (tokenId(w1).toLong * v + tokenId(w2)) -> cost(ctx(w1) + v.toLong,
        c12 + 1L)
    }.toMap
    val idxM = typedLit(idx)
    val ctxArrLit = typedLit(ctxArr.toSeq)
    val bgM = typedLit(bgCostL)
    val wsIds = transform(toks(col("text")), t =>
      coalesce(try_element_at(idxM, t), lit(unkId)))
    val pairCosts = zip_with(
      slice(col("__ws"), lit(1), size(col("__ws")) - 1),
      slice(col("__ws"), lit(2), size(col("__ws")) - 1),
      (a, b) => coalesce(
        try_element_at(bgM, a.cast("long") * lit(v.toLong) + b.cast("long")),
        element_at(ctxArrLit, a + lit(1))))
    docs
      .withColumn("__ws", when(col("text").isNotNull, wsIds))
      .withColumn("n_bigrams",
        when(col("__ws").isNotNull && size(col("__ws")) >= 2,
          (size(col("__ws")) - 1).cast("long")).otherwise(lit(0L)))
      .withColumn("cost_sum",
        when(col("n_bigrams") > 0,
          aggregate(pairCosts, lit(0L), (acc, c) => acc + c)))
      .select(col("doc_id"), col("n_bigrams"), col("cost_sum"),
        when(col("n_bigrams") > 0,
          col("cost_sum").cast("double") / col("n_bigrams").cast("double"))
          .as("avg_surprisal_micro"))
  }

  // ------------------------------------------------------------------
  // Gopher rule filter (Rae et al. 2021 §A1.1 — the rule-based document
  // gate every web-corpus pipeline runs before any model-based filter).
  // Every rule is an INTEGER comparison (counts cross-multiplied against
  // per-mille thresholds — never a float ratio), so verdicts are
  // bit-identical in any engine and a threshold can never drift on
  // rounding. Each rule ships as its own boolean column (the snk3
  // mode-as-data pattern): curation debugging needs "why did this doc
  // fail", not just the AND.

  /** Thresholds for [[gopherRules]]. Defaults are the published Gopher
    * values where the rule has a direct analog (word count 50–100k, mean
    * word length 3–10, ≥ 80% alphabetic words, ≤ 10% symbol words, ≥ 2
    * distinct stopwords); `maxTopTokenPerMille` is the single-token face
    * of Gopher's top-2-gram-fraction rule. Ratio thresholds are
    * per-mille integers; the stopword list is a parameter because a
    * corpus-appropriate function-word set is what makes the rule
    * discriminate (the paper's English list, on a non-English or
    * synthetic corpus, fails everything). */
  final case class GopherParams(
      minTokens: Long = 50L,
      maxTokens: Long = 100000L,
      minMeanLenMilli: Long = 3000L,
      maxMeanLenMilli: Long = 10000L,
      minAlphaPerMille: Long = 800L,
      maxSymbolPerMille: Long = 100L,
      minStopwords: Long = 2L,
      maxTopTokenPerMille: Long = 200L,
      stopwords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      symbols: Seq[String] = Seq("#", "...", "…"))

  /** The six per-document counts every rule verdict derives from, as a
    * single stateless projection (top-token count excluded — see the two
    * siblings). NULL text → NULL counts, so unscoreable rows surface as
    * NULL verdicts rather than fabricated passes. */
  private def gopherBaseCounts(docs: DataFrame,
                               p: GopherParams): DataFrame = {
    val ws = col("__ws")
    docs
      .withColumn("__ws", when(col("text").isNotNull, toks(col("text"))))
      .withColumn("n", size(ws).cast("long"))
      .withColumn("sum_len",
        aggregate(ws, lit(0L), (a, t) => a + length(t).cast("long")))
      .withColumn("n_alpha",
        size(filter(ws, t => t.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("n_sym",
        size(filter(ws, t => t.isin(p.symbols: _*))).cast("long"))
      // distinct stopwords PRESENT: iterate the fixed list, probe the
      // doc — O(|stopwords|·n) with an 8-element outer loop, and
      // duplicates in the doc can't double-count
      .withColumn("n_stop",
        when(ws.isNotNull,
          size(filter(typedLit(p.stopwords), s => array_contains(ws, s)))
            .cast("long")))
  }

  /** Rule verdicts from the count columns — ONE definition shared by
    * both siblings, so the relational and row-wise faces cannot apply
    * different formulas. All comparisons are exact integer
    * cross-multiplications. `gopher_pass` is the strict AND with NULL
    * collapsing to false (an unscoreable doc never passes a filter). */
  private def gopherVerdicts(counts: DataFrame,
                             p: GopherParams): DataFrame = {
    val rules: Seq[(String, Column)] = Seq(
      "r_word_count" ->
        (col("n") >= p.minTokens && col("n") <= p.maxTokens),
      "r_mean_word_len" ->
        (col("sum_len") * lit(1000L) >= lit(p.minMeanLenMilli) * col("n") &&
          col("sum_len") * lit(1000L) <= lit(p.maxMeanLenMilli) * col("n")),
      "r_alpha" ->
        (col("n_alpha") * lit(1000L) >= lit(p.minAlphaPerMille) * col("n")),
      "r_symbol" ->
        (col("n_sym") * lit(1000L) <= lit(p.maxSymbolPerMille) * col("n")),
      "r_stopwords" -> (col("n_stop") >= p.minStopwords),
      "r_top_token" ->
        (col("top_cnt") * lit(1000L) <= lit(p.maxTopTokenPerMille) * col("n")))
    counts.select(
      (col("doc_id") +: col("n").as("n_tokens") +:
        rules.map { case (name, c) => c.as(name) }) :+
        coalesce(rules.map(_._2).reduce(_ && _), lit(false))
          .as("gopher_pass"): _*)
  }

  /** Gopher rule gate, RELATIONAL form: the five in-row counts plus the
    * top-token count via explode → (doc, token) count → per-doc max —
    * two narrow doc-keyed shuffles carrying (doc_id, hashable token,
    * long), linear in corpus size regardless of document length. The
    * production shape for long-document corpora. */
  def gopherRules(docs: DataFrame,
                  p: GopherParams = GopherParams()): DataFrame = {
    val top = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_cnt"))
    gopherVerdicts(
      gopherBaseCounts(docs, p).join(top, Seq("doc_id"), "left"), p)
  }

  /** Gopher rule gate, ROW-WISE form: bit-identical verdicts
    * (spec-pinned) from ONE stateless projection — the top-token count
    * computed in-row as max over distinct tokens of the token's
    * occurrence count (O(u·n) per doc; bounded document length makes
    * that a constant). No shuffle, no state: legal in any Structured
    * Streaming output mode — the serve/stream shape of [[gopherRules]]. */
  def gopherRulesRowwise(docs: DataFrame,
                         p: GopherParams = GopherParams()): DataFrame = {
    val ws = col("__ws")
    gopherVerdicts(
      gopherBaseCounts(docs, p)
        .withColumn("top_cnt",
          array_max(transform(array_distinct(ws),
            t => size(filter(ws, x => x === t)).cast("long")))), p)
  }

  // ------------------------------------------------------------------
  // DSIR data selection (Xie et al. 2023 — Data Selection for Language
  // Models via Importance Resampling): score every raw document by the
  // log importance weight log p_target(x) − log p_raw(x) under two
  // hashed-unigram bag-of-words models, then keep the top-k. The feature
  // hashing is [[hashedBagOfWords]]'s (vocabulary-free, B buckets sizes
  // the collision rate); the log probabilities are the perplexity
  // filter's EXACT quantized-ln integer chain, so weights are BIGINT
  // micro-nats reproducible bit-for-bit in any engine.

  /** A trained DSIR importance model: per-bucket cost difference
    * cost_raw(b) − cost_target(b) in micro-nats, where cost_X(b) is the
    * quantized −ln of the add-1-smoothed bucket probability
    * (c_X(b)+1)/(T_X+B) under corpus X. `buckets` numbers — train on
    * 100 TB, serve as a B-long array. */
  final case class DsirModel(
      buckets: Int,
      seed: String,
      algo: String,
      diffMicro: IndexedSeq[Long])

  /** Per-bucket token counts of a corpus as a dense driver array —
    * bounded by `buckets`, corpus-size-independent (ONE explode + ONE
    * B-group aggregate with map-side combine). */
  private def bucketCounts(docs: DataFrame, buckets: Int, seed: String,
                           algo: String): Array[Long] = {
    val counts = Array.fill(buckets)(0L)
    docs.filter(col("text").isNotNull)
      .select(explode(toks(col("text"))).as("token"))
      .withColumn("b", Sampling.bucket(col("token"), seed, algo) % buckets)
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
      .collect().foreach(r => counts(r.getLong(0).toInt) = r.getLong(1))
    counts
  }

  /** Train the DSIR importance model: two bounded aggregates (raw and
    * target bucket counts), cost chains evaluated exactly driver-side
    * over the 2·B inputs. Empty buckets smooth to (T+B)/1, which the
    * [[SurprisalCapMilli]] cap bounds — identical on both sides, so an
    * all-empty bucket contributes a diff of 0. */
  def dsirTrain(raw: DataFrame, target: DataFrame, buckets: Int,
                seed: String, algo: String = "xxh64"): DsirModel = {
    require(buckets >= 2 && buckets <= 65536,
      s"buckets must be in [2, 65536], got $buckets")
    val cRaw = bucketCounts(raw, buckets, seed, algo)
    val cTar = bucketCounts(target, buckets, seed, algo)
    val tRaw = cRaw.sum; val tTar = cTar.sum
    def cost(total: Long, c: Long): Long =
      quantCost(math.min((total + buckets) * 1000L / (c + 1L),
        SurprisalCapMilli))
    val diff = (0 until buckets).map(b =>
      cost(tRaw, cRaw(b)) - cost(tTar, cTar(b)))
    DsirModel(buckets, seed, algo, diff)
  }

  /** Score every document: logw_micro = Σ_tokens diff(bucket(token)) —
    * ONE stateless projection (hash, array-index, sum; no explode, no
    * join, no shuffle), the serve/stream shape. NULL text → NULL weight,
    * n_feat_tokens 0. Positive weights read "more target-like than the
    * raw corpus". */
  def dsirLogWeights(docs: DataFrame, model: DsirModel): DataFrame = {
    val diffLit = typedLit(model.diffMicro)
    val perTok = transform(col("__ws"), t =>
      element_at(diffLit,
        (Sampling.bucket(t, model.seed, model.algo) % model.buckets)
          .cast("int") + lit(1)))
    docs
      .withColumn("__ws", when(col("text").isNotNull, toks(col("text"))))
      .withColumn("n_feat_tokens",
        coalesce(size(col("__ws")).cast("long"), lit(0L)))
      .withColumn("logw_micro",
        when(col("__ws").isNotNull,
          aggregate(perTok, lit(0L), (a, c) => a + c)))
      .select(col("doc_id"), col("n_feat_tokens"), col("logw_micro"))
  }

  /** DSIR selection, EXACT form: keep the `k` documents with the
    * largest importance weight under the total order (logw_micro DESC,
    * doc_id). The verdict ships as a `selected` column (mode-as-data),
    * never as a dropped row, so the gate composes with later stages and
    * the boundary is oracle-visible. The global row_number is the
    * W5/lmPerplexityBuckets exactness price — at corpus scale cut at a
    * persisted [[dsirThreshold]] instead (same gate, one aggregate, no
    * sort). */
  def dsirSelect(docs: DataFrame, model: DsirModel, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("logw_micro").desc, col("doc_id").asc)
    val scored = dsirLogWeights(docs, model)
    val ranked = scored.filter(col("logw_micro").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .select(col("doc_id"), (col("__rn") <= k).as("selected"))
    scored.join(ranked, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_feat_tokens"), col("logw_micro"),
        coalesce(col("selected"), lit(false)).as("selected"))
  }

  /** The SCALE form of the selection cut: a weight threshold from a
    * single-pass quantile sketch at the target keep fraction — persist
    * SNK6-style, gate any later frame (including a stream) with
    * [[dsirGateWith]]. Agreement with [[dsirSelect]] is within the
    * sketch's rank-error band (the lmPerplexityThresholds contract). */
  def dsirThreshold(scored: DataFrame, keepFraction: Double,
                    accuracy: Int = 10000): DataFrame = {
    require(keepFraction > 0.0 && keepFraction < 1.0,
      s"keepFraction must be in (0,1), got $keepFraction")
    scored.filter(col("logw_micro").isNotNull)
      .agg(expr(s"approx_percentile(logw_micro, ${1.0 - keepFraction}, " +
        s"$accuracy)").as("min_logw"))
  }

  /** Apply a persisted threshold: one-row broadcast cross join +
    * scan-speed CASE — the stream-static shape. */
  def dsirGateWith(scored: DataFrame, threshold: DataFrame): DataFrame =
    scored.crossJoin(broadcast(threshold))
      .select(col("doc_id"), col("n_feat_tokens"), col("logw_micro"),
        coalesce(col("logw_micro") >= col("min_logw"), lit(false))
          .as("selected"))
}
