package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Decontamination, Dedup, Features, Multimodal, Profiling, Sampling, Similarity, TextAnalysis, UrlCuration}

/** LLM-data-pipeline extension operators (north star, BASELINE.json):
  * deduplication (exact / n-gram Jaccard / MinHash-LSH / SimHash),
  * similarity search (brute-force + LSH-bucketed cosine top-k),
  * text analysis (stats, quality, language-ID, fingerprints), and
  * multimodal binary-column plumbing. Implementations in graft.operators.
  *
  * Oracle policy: everything except the xxhash64-dependent ANN sketches
  * (ann_lsh_topk, ann_ivf_topk) is paired with an independent DuckDB
  * re-implementation; MinHash-LSH is checked against the EXACT-Jaccard
  * ground truth (verification step ⇒ precision 1.0; recall must hit 1.0
  * on this corpus for the row to stay green — the per-pair recall bound
  * 1−(1−j)^16 at j ≥ 0.5 is ≈ 0.9999847). The SimHash family runs with
  * the md5-derived shingle hash (algo="md5", [[Dedup.hashedShingles]]) so
  * the full sketch → band → Hamming-verify chain is differential-tested
  * against DuckDB; xxhash64 stays the production default and its path is
  * pinned by DedupSpec. The remaining rows-only queries get ScalaTest
  * recall pins.
  */
object ExtensionQueries {

  /** Per-process, per-call scratch path from the shared [[Scratch]]
    * factory (registers the exit-time cleanup hook itself — no reliance
    * on another module running first). */
  private def scratch(name: String): String = Scratch.dir(s"ext-$name")

  /** Shared DuckDB CTE: distinct word-3-gram shingles per doc. */
  private val duckShingles =
    """w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    CASE WHEN len(ws) < 3 THEN []
      |         ELSE list_distinct(list_transform(generate_series(1, len(ws) - 2),
      |                i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))
      |    END AS sh
      |  FROM w)""".stripMargin

  /** Shared DuckDB CTE chain: per-doc 63-bit SimHash over md5-derived
    * 60-bit shingle hashes — the independent re-implementation of
    * [[graft.functions.SimHash63]] ∘ [[graft.functions.WordNGramHashes]]
    * (algo="md5"). `CAST('0x'||substr(md5(g),1,15) AS BIGINT)` equals the
    * Scala side's big-endian-first-8-bytes >>> 4; the majority vote folds
    * bit b of the inputs into OUTPUT bit (62−b), exactly SimHash63's
    * `acc = acc*2 + majority(b)` layout. */
  private val duckSimhashSketch =
    s"""$duckShingles,
       |hs AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(sh,
       |      g -> CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT))) AS hv
       |  FROM s WHERE len(sh) > 0),
       |u AS (SELECT doc_id, unnest(hv) AS h FROM hs),
       |bits AS (
       |  SELECT u.doc_id, t.b,
       |    sum(CASE WHEN (u.h >> t.b) & 1 = 1 THEN 1 ELSE -1 END) AS cnt
       |  FROM u, (SELECT unnest(generate_series(0, 62)) AS b) t
       |  GROUP BY u.doc_id, t.b),
       |sk AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN cnt > 0 THEN (CAST(1 AS BIGINT) << (62 - b))
       |             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY doc_id)""".stripMargin

  /** Shared DuckDB CTE: per-doc token count + quality score (the
    * ext_quality_score semantics — 3 gates / 3.0). One source of truth for
    * every oracle that filters on quality. */
  private val duckQualityCte =
    """qst AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS ttr,
      |    CAST(len(list_filter(string_split(text, ' '),
      |           t -> list_contains(['the','a','of','in','to','and','is'], t)))
      |         AS DOUBLE) / len(string_split(text, ' ')) AS swr
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, n_tokens,
      |    (CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 1 ELSE 0 END
      |     + CASE WHEN ttr >= 0.25 THEN 1 ELSE 0 END
      |     + CASE WHEN swr >= 0.02 THEN 1 ELSE 0 END) / 3.0 AS quality_score
      |  FROM qst)""".stripMargin

  /** Shared DuckDB CTE: marker-token language prediction (the ext_lang_id
    * semantics — argmax with ties to the lexicographically greatest code,
    * no hits → 'und'). */
  private val duckLangCte =
    """lsc AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(string_split(text,' '), t -> list_contains(['the','a','of','fast','slow'], t))) AS s_en,
      |    len(list_filter(string_split(text,' '), t -> list_contains(['der','die','das','und'], t))) AS s_de,
      |    len(list_filter(string_split(text,' '), t -> list_contains(['le','la','et','les'], t))) AS s_fr,
      |    len(list_filter(string_split(text,' '), t -> list_contains(['el','la','y','los'], t))) AS s_es,
      |    len(list_filter(string_split(text,' '), t -> list_contains(['的','了','是'], t))) AS s_zh
      |  FROM documents),
      |lp AS (
      |  SELECT doc_id, lang AS lang_actual,
      |    CASE WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN 'und'
      |         WHEN s_zh >= s_fr AND s_zh >= s_es AND s_zh >= s_en AND s_zh >= s_de THEN 'zh'
      |         WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
      |         WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
      |         WHEN s_en >= s_de THEN 'en'
      |         ELSE 'de' END AS lang_predicted,
      |    CAST(greatest(s_en, s_de, s_es, s_fr, s_zh) AS BIGINT) AS marker_hits
      |  FROM lsc)""".stripMargin

  /** Generated DuckDB oracle for ext_lm_perplexity — the full CCNet
    * chain re-derived independently: md5 hash-gate the reference split
    * (SamplingQueries.duckBucket convention), top-`vocabK` reference
    * unigrams under (count DESC, token), alphabet-map both corpora into
    * vocab ∪ '<unk>', full per-context counts + top-`lmK` bigram counts
    * under (count DESC, w1, w2), then the exact quantized-surprisal
    * integer chain of [[TextAnalysis.lmScore]]: r = least(num·1000 div
    * den, cap), the 13-branch exponent ladder, m = r >> e, and cost =
    * e·Ln2Micro + q(m). The 1000-row mantissa table q(m) is interpolated
    * from [[TextAnalysis.LnMantissaMicro]] — a corpus-independent math
    * constant shared verbatim (the PoissonCdfMicro convention), so both
    * engines sum bit-identical BIGINT costs. */
  private def lmPerplexityOracle(vocabK: Int, lmK: Int,
                                 refFraction: Double, seed: String,
                                 src: String = "documents"): String = {
    val v = vocabK + 1
    val qs = TextAnalysis.LnMantissaMicro.map(_._2).mkString(", ")
    val cap = TextAnalysis.SurprisalCapMilli
    val ln2 = TextAnalysis.Ln2Micro
    val gate = math.round(refFraction * graft.operators.Sampling.Scale)
    val ladder = (13 to 1 by -1)
      .map(k => s"WHEN r >= ${1000L << k} THEN $k").mkString(" ")
    s"""WITH lnq AS (
       |  SELECT unnest(generate_series(1000, 1999)) AS m,
       |         unnest([$qs]) AS q),
       |rw AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM $src
       |  WHERE text IS NOT NULL
       |    AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
       |      || ':$seed'), 1, 15)) AS BIGINT) % 1000000 < $gate),
       |vocab AS (
       |  SELECT token FROM (
       |    SELECT token, count(*) AS n
       |    FROM (SELECT unnest(ws) AS token FROM rw) GROUP BY 1)
       |  QUALIFY row_number() OVER (ORDER BY n DESC, token) <= $vocabK),
       |rpair AS (
       |  SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
       |           i -> ws[i])) AS w1raw,
       |         unnest(list_transform(generate_series(1, len(ws) - 1),
       |           i -> ws[i+1])) AS w2raw
       |  FROM rw WHERE len(ws) >= 2),
       |rmap AS (
       |  SELECT CASE WHEN v1.token IS NOT NULL THEN w1raw
       |              ELSE '<unk>' END AS w1,
       |         CASE WHEN v2.token IS NOT NULL THEN w2raw
       |              ELSE '<unk>' END AS w2
       |  FROM rpair
       |  LEFT JOIN vocab v1 ON v1.token = rpair.w1raw
       |  LEFT JOIN vocab v2 ON v2.token = rpair.w2raw),
       |ctx AS (SELECT w1, count(*) AS c1 FROM rmap GROUP BY w1),
       |lm AS (
       |  SELECT w1, w2, c12 FROM (
       |    SELECT w1, w2, count(*) AS c12 FROM rmap GROUP BY 1, 2)
       |  QUALIFY row_number() OVER (ORDER BY c12 DESC, w1, w2) <= $lmK),
       |dw AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM $src
       |  WHERE text IS NOT NULL),
       |dpair AS (
       |  SELECT doc_id,
       |    unnest(list_transform(generate_series(1, len(ws) - 1),
       |      i -> ws[i])) AS w1raw,
       |    unnest(list_transform(generate_series(1, len(ws) - 1),
       |      i -> ws[i+1])) AS w2raw
       |  FROM dw WHERE len(ws) >= 2),
       |dmap AS (
       |  SELECT doc_id,
       |    CASE WHEN v1.token IS NOT NULL THEN w1raw
       |         ELSE '<unk>' END AS w1,
       |    CASE WHEN v2.token IS NOT NULL THEN w2raw
       |         ELSE '<unk>' END AS w2
       |  FROM dpair
       |  LEFT JOIN vocab v1 ON v1.token = dpair.w1raw
       |  LEFT JOIN vocab v2 ON v2.token = dpair.w2raw),
       |inst AS (
       |  SELECT doc_id,
       |    least((coalesce(ctx.c1, 0) + $v) * 1000
       |          // (coalesce(lm.c12, 0) + 1), $cap) AS r
       |  FROM dmap
       |  LEFT JOIN lm ON lm.w1 = dmap.w1 AND lm.w2 = dmap.w2
       |  LEFT JOIN ctx ON ctx.w1 = dmap.w1),
       |led AS (
       |  SELECT doc_id, r, CASE $ladder ELSE 0 END AS e FROM inst),
       |cost AS (
       |  SELECT doc_id, CAST(e AS BIGINT) * $ln2 + lnq.q AS cost
       |  FROM led JOIN lnq ON lnq.m = (led.r >> led.e)),
       |perdoc AS (
       |  SELECT doc_id, count(*) AS n_bigrams,
       |         CAST(sum(cost) AS BIGINT) AS cost_sum
       |  FROM cost GROUP BY doc_id),
       |scored AS (
       |  SELECT d.doc_id, coalesce(p.n_bigrams, 0) AS n_bigrams, p.cost_sum,
       |    CAST(p.cost_sum AS DOUBLE) / CAST(p.n_bigrams AS DOUBLE)
       |      AS avg_surprisal_micro
       |  FROM (SELECT doc_id FROM $src) d LEFT JOIN perdoc p USING (doc_id)),
       |so AS (SELECT * FROM scored WHERE cost_sum IS NOT NULL),
       |bk AS (
       |  SELECT doc_id,
       |    CASE WHEN 3 * row_number() OVER (ORDER BY avg_surprisal_micro, doc_id)
       |           <= count(*) OVER () THEN 'head'
       |         WHEN 3 * row_number() OVER (ORDER BY avg_surprisal_micro, doc_id)
       |           <= 2 * count(*) OVER () THEN 'middle'
       |         ELSE 'tail' END AS ppl_bucket
       |  FROM so)
       |SELECT s.doc_id, s.n_bigrams, s.cost_sum, s.avg_surprisal_micro,
       |  coalesce(bk.ppl_bucket, 'unscored') AS ppl_bucket
       |FROM scored s LEFT JOIN bk USING (doc_id)""".stripMargin
  }

  /** Generated DuckDB oracle for ext_bm25_search: per-term df/N/T from
    * the corpus, idf through the exact integer quantized-ln chain (the
    * lmPerplexityOracle ladder + shared mantissa table), tf-side as the
    * cleared integer identity, score as the fixed left-assoc sum of
    * IEEE divisions — the Spark plan computes idf driver-side from a
    * collected stats row; this derivation is fully relational, so the
    * hash match certifies both the chain and the stats pass. */
  private def bm25Oracle(terms: Seq[String], k: Int): String = {
    val qs = TextAnalysis.LnMantissaMicro.map(_._2).mkString(", ")
    val cap = TextAnalysis.SurprisalCapMilli
    val ln2 = TextAnalysis.Ln2Micro
    def ladder(c: String) =
      (13 to 1 by -1).map(kk => s"WHEN $c >= ${1000L << kk} THEN $kk")
        .mkString("CASE ", " ", " ELSE 0 END")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(ws, w -> w = '$t')) AS tf_$i" }.mkString(",\n    ")
    val dfCols = terms.indices.map(i =>
      s"sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    val rCols = terms.indices.map(i =>
      s"CAST(least(((2*(n - df$i) + 1) + (2*df$i + 1)) * 1000 " +
        s"// (2*df$i + 1), $cap) AS BIGINT) AS r$i")
      .mkString(",\n    ")
    val eCols = terms.indices.map(i => s"(${ladder(s"r$i")}) AS e$i")
      .mkString(",\n    ")
    val idfCols = terms.indices.map(i =>
      s"e$i * $ln2 + (SELECT q FROM lnq WHERE m = (r$i >> e$i)) AS idf$i")
      .mkString(",\n    ")
    val scoreSum = terms.indices.map(i =>
      s"""CASE WHEN f.tf_$i > 0 THEN
         |      CAST(i.idf$i * 44 * f.tf_$i * i.t AS DOUBLE)
         |      / CAST(20 * f.tf_$i * i.t + 6 * i.t + 18 * f.dl * i.n AS DOUBLE)
         |    ELSE 0.0 END""".stripMargin)
      .mkString("0.0\n    + ", "\n    + ", "")
    val tfOut = terms.indices.map(i => s"tf_$i").mkString(", ")
    s"""WITH lnq AS (
       |  SELECT unnest(generate_series(1000, 1999)) AS m,
       |         unnest([$qs]) AS q),
       |dw AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |  WHERE text IS NOT NULL),
       |f AS (
       |  SELECT doc_id, len(ws) AS dl,
       |    $tfCols
       |  FROM dw),
       |st AS (
       |  SELECT count(*) AS n, sum(dl) AS t, $dfCols FROM f),
       |rs AS (
       |  SELECT n, t,
       |    $rCols
       |  FROM st),
       |es AS (
       |  SELECT *,
       |    $eCols
       |  FROM rs),
       |idf AS (
       |  SELECT *,
       |    $idfCols
       |  FROM es),
       |sc AS (
       |  SELECT f.doc_id, f.dl, $tfOut,
       |    $scoreSum AS score
       |  FROM f, idf i)
       |SELECT doc_id, dl, $tfOut, score FROM sc WHERE score > 0
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Generated DuckDB oracle for the Gopher rule gate — every count and
    * integer cross-multiplication re-derived relationally (list HOFs for
    * the in-row counts, unnest → group → max for the top-token count);
    * one derivation grades BOTH Spark siblings (relational and rowwise),
    * so a hash match certifies three independent algorithms landed on
    * identical verdicts. */
  private def gopherOracle(p: TextAnalysis.GopherParams,
                           src: String = "documents"): String = {
    val stop = p.stopwords.map("'" + _ + "'").mkString(", ")
    val sym = p.symbols.map("'" + _ + "'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM $src
       |  WHERE text IS NOT NULL),
       |c AS (
       |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(ws, w -> CAST(len(w) AS BIGINT))),
       |      (a, b) -> a + b) AS BIGINT) AS sum_len,
       |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
       |      AS BIGINT) AS n_alpha,
       |    CAST(len(list_filter(ws, w -> list_contains([$sym], w)))
       |      AS BIGINT) AS n_sym,
       |    CAST(len(list_filter([$stop], s -> list_contains(ws, s)))
       |      AS BIGINT) AS n_stop
       |  FROM t),
       |tc AS (
       |  SELECT doc_id, max(cnt) AS top_cnt FROM (
       |    SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt
       |    FROM (SELECT doc_id, unnest(ws) AS tok FROM t) GROUP BY 1, 2)
       |  GROUP BY 1),
       |r AS (
       |  SELECT c.doc_id, c.n,
       |    c.n >= ${p.minTokens} AND c.n <= ${p.maxTokens} AS r_word_count,
       |    c.sum_len * 1000 >= ${p.minMeanLenMilli} * c.n AND
       |      c.sum_len * 1000 <= ${p.maxMeanLenMilli} * c.n
       |      AS r_mean_word_len,
       |    c.n_alpha * 1000 >= ${p.minAlphaPerMille} * c.n AS r_alpha,
       |    c.n_sym * 1000 <= ${p.maxSymbolPerMille} * c.n AS r_symbol,
       |    c.n_stop >= ${p.minStopwords} AS r_stopwords,
       |    tc.top_cnt * 1000 <= ${p.maxTopTokenPerMille} * c.n
       |      AS r_top_token
       |  FROM c JOIN tc USING (doc_id))
       |SELECT d.doc_id, r.n AS n_tokens, r.r_word_count,
       |  r.r_mean_word_len, r.r_alpha, r.r_symbol, r.r_stopwords,
       |  r.r_top_token,
       |  coalesce(r.r_word_count AND r.r_mean_word_len AND r.r_alpha AND
       |    r.r_symbol AND r.r_stopwords AND r.r_top_token, false)
       |    AS gopher_pass
       |FROM $src d LEFT JOIN r USING (doc_id)""".stripMargin
  }

  /** Generated DuckDB oracle for ext_dsir_select — the whole DSIR chain
    * re-derived relationally: md5 bucket hashing, raw/target bucket
    * counts, add-1-smoothed bucket costs through the exact quantized-ln
    * integer chain (the lmPerplexityOracle ladder + shared mantissa
    * table), per-doc BIGINT weight sums, and the exact (logw DESC,
    * doc_id) top-k cut. The Spark side trains driver-side and scores
    * row-wise with zero joins — two maximally different algorithms, one
    * hash. */
  private def dsirOracle(targetSources: Seq[String], buckets: Int,
                         seed: String, k: Int): String = {
    val qs = TextAnalysis.LnMantissaMicro.map(_._2).mkString(", ")
    val cap = TextAnalysis.SurprisalCapMilli
    val ln2 = TextAnalysis.Ln2Micro
    val srcs = targetSources.map("'" + _ + "'").mkString(", ")
    val ladder = (13 to 1 by -1)
      .map(kk => s"WHEN r >= ${1000L << kk} THEN $kk").mkString(" ")
    s"""WITH lnq AS (
       |  SELECT unnest(generate_series(1000, 1999)) AS m,
       |         unnest([$qs]) AS q),
       |tok AS (
       |  SELECT d.doc_id, d.source, unnest(string_split(d.text, ' ')) AS token
       |  FROM documents d WHERE d.text IS NOT NULL),
       |tb AS (
       |  SELECT doc_id, source,
       |    CAST(('0x' || substr(md5(token || ':$seed'), 1, 15)) AS BIGINT)
       |      % 1000000 % $buckets AS b
       |  FROM tok),
       |bs AS (SELECT unnest(generate_series(0, ${buckets - 1})) AS b),
       |rawc AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM tb GROUP BY 1),
       |tarc AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM tb
       |         WHERE source IN ($srcs) GROUP BY 1),
       |traw AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS t FROM rawc),
       |ttar AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS t FROM tarc),
       |cr0 AS (SELECT bs.b,
       |  least((traw.t + $buckets) * 1000 // (coalesce(rawc.c, 0) + 1),
       |        $cap) AS r
       |  FROM bs LEFT JOIN rawc USING (b), traw),
       |cr1 AS (SELECT b, r, CASE $ladder ELSE 0 END AS e FROM cr0),
       |cr AS (SELECT b, CAST(e AS BIGINT) * $ln2 + lnq.q AS cost
       |  FROM cr1 JOIN lnq ON lnq.m = (cr1.r >> cr1.e)),
       |ct0 AS (SELECT bs.b,
       |  least((ttar.t + $buckets) * 1000 // (coalesce(tarc.c, 0) + 1),
       |        $cap) AS r
       |  FROM bs LEFT JOIN tarc USING (b), ttar),
       |ct1 AS (SELECT b, r, CASE $ladder ELSE 0 END AS e FROM ct0),
       |ct AS (SELECT b, CAST(e AS BIGINT) * $ln2 + lnq.q AS cost
       |  FROM ct1 JOIN lnq ON lnq.m = (ct1.r >> ct1.e)),
       |df AS (SELECT cr.b, cr.cost - ct.cost AS dd FROM cr JOIN ct USING (b)),
       |perdoc AS (
       |  SELECT tb.doc_id, CAST(count(*) AS BIGINT) AS nf,
       |    CAST(sum(dd) AS BIGINT) AS logw
       |  FROM tb JOIN df USING (b) GROUP BY 1),
       |rk AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY logw DESC, doc_id) AS rn
       |  FROM perdoc)
       |SELECT d.doc_id, coalesce(p.nf, 0) AS n_feat_tokens,
       |  p.logw AS logw_micro,
       |  coalesce(rk.rn <= $k, false) AS selected
       |FROM documents d LEFT JOIN perdoc p USING (doc_id)
       |LEFT JOIN rk USING (doc_id)""".stripMargin
  }

  /** Intra-doc repeated-span scrub re-derived relationally in DuckDB:
    * gram first-position window + coverage join + ordered rebuild —
    * shared by the relational and rowwise Spark forms (three
    * independent algorithms, one hash). */
  private val duckSpanScrub =
    """WITH t AS (
      |  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, ws, len(ws) AS m,
      |    unnest(generate_series(1, len(ws))) AS k
      |  FROM t),
      |tk AS (
      |  SELECT doc_id, m, k, ws[k] AS w,
      |    CASE WHEN k <= m - 2
      |      THEN array_to_string(ws[k:k+2], ' ') END AS gram
      |  FROM tok),
      |d AS (
      |  SELECT doc_id, k, w,
      |    CASE WHEN gram IS NOT NULL THEN
      |      CAST(k > min(k) OVER (PARTITION BY doc_id, gram) AS INT)
      |    END AS dup
      |  FROM tk),
      |cov AS (
      |  SELECT t1.doc_id, t1.k, t1.w,
      |    count(t2.dup) > 0 AND min(t2.dup) = 1 AS removed
      |  FROM d t1
      |  LEFT JOIN d t2 ON t2.doc_id = t1.doc_id
      |    AND t2.k BETWEEN t1.k - 2 AND t1.k AND t2.dup IS NOT NULL
      |  GROUP BY 1, 2, 3)
      |SELECT doc_id, count(*) AS n_tokens,
      |  count(CASE WHEN removed THEN 1 END) AS n_removed,
      |  coalesce(string_agg(CASE WHEN NOT removed THEN w END, ' '
      |    ORDER BY k), '') AS text_clean
      |FROM cov GROUP BY doc_id""".stripMargin

  /** [[duckSpanScrub]] with GLOBAL gram first-occurrence: dup iff
    * (doc_id, k) is strictly after the corpus-wide minimum (doc_id, k)
    * of an equal gram — struct comparison IS the lexicographic total
    * order in both engines. Everything else identical. */
  private val duckSpanScrubGlobal =
    """WITH t AS (
      |  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, ws, len(ws) AS m,
      |    unnest(generate_series(1, len(ws))) AS k
      |  FROM t),
      |tk AS (
      |  SELECT doc_id, m, k, ws[k] AS w,
      |    CASE WHEN k <= m - 2
      |      THEN array_to_string(ws[k:k+2], ' ') END AS gram
      |  FROM tok),
      |d AS (
      |  SELECT doc_id, k, w,
      |    CASE WHEN gram IS NOT NULL THEN
      |      CAST(struct_pack(d := doc_id, k := k) >
      |        min(struct_pack(d := doc_id, k := k))
      |          OVER (PARTITION BY gram) AS INT)
      |    END AS dup
      |  FROM tk),
      |cov AS (
      |  SELECT t1.doc_id, t1.k, t1.w,
      |    count(t2.dup) > 0 AND min(t2.dup) = 1 AS removed
      |  FROM d t1
      |  LEFT JOIN d t2 ON t2.doc_id = t1.doc_id
      |    AND t2.k BETWEEN t1.k - 2 AND t1.k AND t2.dup IS NOT NULL
      |  GROUP BY 1, 2, 3)
      |SELECT doc_id, count(*) AS n_tokens,
      |  count(CASE WHEN removed THEN 1 END) AS n_removed,
      |  coalesce(string_agg(CASE WHEN NOT removed THEN w END, ' '
      |    ORDER BY k), '') AS text_clean
      |FROM cov GROUP BY doc_id""".stripMargin

  /** Shared WITH-chain for the URL-curation oracles: re-derives the
    * deterministic URL synthesis (md5 bit scatter over base = doc_id/2)
    * AND the full normalization algebra (scheme/host case, www strip,
    * default port, trailing slash, tracking-param drop + bytewise param
    * sort, fragment drop) — every regex lookahead-free so Java ≡ RE2.
    * Ends at relation `nn(doc_id, url, url_norm, domain)`. */
  private def duckUrlChain(seed: String): String =
    s"""WITH syn AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':$seed'),
       |      1, 15)) AS BIGINT) % 1000000 AS h,
       |    doc_id // 2 AS base
       |  FROM documents),
       |u AS (
       |  SELECT doc_id,
       |    (CASE WHEN h % 2 = 1 THEN 'HTTPS' ELSE 'https' END) || '://' ||
       |    (CASE WHEN h // 2 % 2 = 1 THEN 'WWW.' ELSE '' END) ||
       |    (CASE WHEN h // 4 % 2 = 1
       |      THEN upper('d' || CAST(base % 40 AS VARCHAR) || '.example.com')
       |      ELSE 'd' || CAST(base % 40 AS VARCHAR) || '.example.com' END) ||
       |    (CASE WHEN h // 8 % 2 = 1 THEN ':443' ELSE '' END) ||
       |    '/p/' || CAST(base AS VARCHAR) ||
       |    (CASE WHEN h // 16 % 2 = 1 THEN '/' ELSE '' END) ||
       |    (CASE WHEN h // 32 % 2 = 1
       |      THEN '?b=2&a=1&utm_source=feed&gclid=g1'
       |      ELSE '?a=1&b=2' END) ||
       |    (CASE WHEN (h % 2) <> (h // 2 % 2) THEN '#sec' ELSE '' END)
       |      AS url
       |  FROM syn),
       |p1 AS (
       |  SELECT doc_id, url,
       |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
       |      AS scheme,
       |    regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
       |  FROM u),
       |p2 AS (
       |  SELECT doc_id, url, scheme,
       |    regexp_extract(rest, '^([^/?#]*)', 1) AS auth,
       |    regexp_replace(rest, '^[^/?#]*', '') AS pathqf
       |  FROM p1),
       |p3 AS (
       |  SELECT doc_id, url, scheme,
       |    regexp_replace(lower(regexp_extract(auth, '^([^:]*)', 1)),
       |      '^www\\.', '') AS hostn,
       |    regexp_extract(auth, ':([0-9]+)$$', 1) AS port,
       |    regexp_replace(regexp_extract(pathqf, '^([^?#]*)', 1),
       |      '/+$$', '') AS path0,
       |    regexp_extract(pathqf, '\\?([^#]*)', 1) AS qraw
       |  FROM p2),
       |p4 AS (
       |  SELECT *, array_to_string(list_sort(list_filter(
       |    string_split(qraw, '&'),
       |    p -> p <> '' AND NOT regexp_matches(p,
       |      '^(utm_[^=]*|gclid|fbclid|msclkid)='))), '&') AS qs
       |  FROM p3),
       |nn AS (
       |  SELECT doc_id, url,
       |    CASE WHEN scheme <> '' AND hostn <> '' THEN
       |      scheme || '://' || hostn ||
       |      (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
       |         OR (scheme = 'https' AND port = '443')
       |       THEN '' ELSE ':' || port END) ||
       |      (CASE WHEN path0 = '' THEN '/' ELSE path0 END) ||
       |      (CASE WHEN qs = '' THEN '' ELSE '?' || qs END)
       |    END AS url_norm,
       |    CASE WHEN scheme <> '' AND hostn <> '' THEN hostn END AS domain
       |  FROM p4)""".stripMargin

  /** Ground-truth near-dup pairs: exact shingle Jaccard ≥ 1/2 as pure
    * integer comparison (no float boundary). */
  private val duckJaccardPairs =
    s"""WITH $duckShingles
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM s a, s b
       |WHERE a.doc_id < b.doc_id
       |  AND 2 * len(list_intersect(a.sh, b.sh)) >=
       |      len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))""".stripMargin

  /** Invariant aggregate for an approximate top-k result — the same
    * data-visible pattern as w5_chrono_split_approx: the raw ANN rows
    * depend on engine-internal hashes/centroids no oracle reproduces, so
    * the registered output is the invariants that MUST hold — every query
    * covered, per-query shape valid (≤k rows, contiguous ranks from 1,
    * distinct non-self neighbours), and recall against the exact
    * brute-force baseline at or above the floor SimilaritySpec pins. The
    * oracle asserts them (TRUE constants + the exact query count); any
    * violation flips a boolean and hash-mismatches. All lazily composed —
    * no driver-side actions at construction. */
  /** Scale-aware candidate budget for shortlist/re-rank stages: a FIXED
    * budget covers 10× less of a 10× corpus, so recall decays with scale
    * (the round-7 ann_pca_topk red row; the round-9 ScaleRecallCheck
    * sweep measured PCA+Flat at 0.524 with shortlist=120 on a 20k-vector
    * corpus). Budgets therefore scale linearly with corpus size with the
    * tuned sf0.1 value as the floor — at the driver's SFs (500/2000
    * rows) the formula reproduces the tuned constants exactly; beyond,
    * the candidate FRACTION stays constant so measured recall holds
    * (sweep at n=20000: PCA 0.524→0.944, PQ 0.719→0.988, IVF-PQ
    * 0.616→0.761 — RECALL_SCALE.md). Costs one metadata-cheap count()
    * per registered row. */
  private def scaledBudget(n: Long, base: Int, frac: Double): Int =
    math.max(base, math.ceil(frac * n).toInt)

  private def annInvariants(queries: DataFrame, approx: DataFrame,
                            exact: DataFrame, k: Int,
                            recallFloor: Double): DataFrame = {
    import org.apache.spark.sql.functions.{every => boolAnd}
    val shape = approx.groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("neighbor_id")).as("nd"),
        countDistinct(col("rank")).as("nr"),
        min(col("rank")).as("rmin"),
        max(col("rank")).as("rmax"),
        max(when(col("neighbor_id") === col("query_id"), 1).otherwise(0)).as("self"))
      .agg(
        count(lit(1)).as("n_covered"),
        boolAnd(col("cnt") <= k && col("nd") === col("cnt") &&
          col("nr") === col("cnt") && col("rmin") === 1 &&
          col("rmax") === col("cnt") && col("self") === 0).as("shape_ok"))
    val nQ = queries.agg(count(lit(1)).as("n_queries"))
    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    val nHit = approx
      .join(exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    nQ.crossJoin(shape).crossJoin(nExact).crossJoin(nHit)
      .select(
        col("n_queries").cast("long"),
        (col("n_covered") === col("n_queries")).as("coverage_ok"),
        col("shape_ok"),
        (col("n_hit") / col("n_exact") >= recallFloor).as("recall_ok"))
  }

  private val annInvariantOracle =
    """SELECT CAST(count(*) AS BIGINT) AS n_queries, TRUE AS coverage_ok,
      |  TRUE AS shape_ok, TRUE AS recall_ok
      |FROM embeddings WHERE vec_id % 50 = 0""".stripMargin

  /** DuckDB double-precision sequential-fold dot product over two FLOAT[]
    * columns — mirrors Similarity.dot bit-for-bit (cast each element to
    * DOUBLE, left fold). */
  private def duckDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(generate_series(1, len($a)),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       |  (acc, x) -> acc + x)""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // Exact dedup: groupBy on (xxhash64(text), length(text)) — 16-byte
    // shuffle rows instead of whole document bodies, the difference between
    // shuffling ~100 TB of corpus and ~1 TB of keys at scale. The oracle
    // groups by text itself: identical survivors unless a 64-bit hash AND
    // length collide across distinct texts (~2⁻⁶⁴ per pair; acceptable for
    // dedup, and the output columns don't expose the key either way).
    "dedup_exact" -> QueryDef(
      (s, dir) => Tables.documents(s, dir)
        .groupBy(xxhash64(col("text")), length(col("text")))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("n_copies")),
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin),

    // Near-dup ground truth: brute-force exact shingle-Jaccard pairs.
    // O(n²) correctness reference — the scale path is dedup_minhash_lsh.
    "dedup_ngram_jaccard" -> QueryDef(
      (s, dir) => Dedup.jaccardPairs(Tables.documents(s, dir),
        n = 3, num = 1, den = 2),
      duckJaccardPairs),

    // MinHash(32 perms) → 16 bands × 2 rows → bucket join → exact verify.
    // Oracle = the exact-Jaccard ground truth: LSH must RECALL every true
    // pair (precision is 1.0 by construction via the verify step).
    // r=2 matters on this low-entropy corpus: single-minhash collisions of
    // background pairs (j≈0.02) would generate ~25× more candidates to
    // verify; two consecutive minhashes collide at j², pruning the noise
    // while 16 bands keep recall ≥99% at the j≥0.5 target.
    "dedup_minhash_lsh" -> QueryDef(
      (s, dir) => Dedup.minhashLshPairs(Tables.documents(s, dir),
        n = 3, numPerm = 32, rowsPerBand = 2, num = 1, den = 2),
      duckJaccardPairs),

    // MinHash LSH with AUTO-SIZED bands (round 13 — the occupancyBits
    // discipline on the last caller-tuned pairing knob): ONE count job
    // derives (numPerm, rowsPerBand) from the corpus size — rowsPerBand
    // grows with log n so expected BACKGROUND candidates per document
    // stay constant (fixed r is quadratic in n — the measured sf1
    // hazard), and the band count re-prices the S-curve to hold ≥99%
    // recall at the j ≥ 1/2 threshold (Dedup.minhashParamsAuto). The
    // oracle is the SAME exact-Jaccard ground truth as the fixed row:
    // auto-sizing must not lose a single true pair at either driver SF.
    "dedup_minhash_lsh_auto" -> QueryDef(
      (s, dir) => Dedup.minhashLshPairsAuto(Tables.documents(s, dir),
        n = 3, num = 1, den = 2),
      duckJaccardPairs),

    // CONTAINMENT near-dup (round 9): |A∩B|/|A| ≥ 0.7 — the DIRECTED
    // subset/quote relation symmetric Jaccard misses (a doc embedded
    // inside a longer one has tiny Jaccard, containment ≈ 1). Ground-
    // truth reference with the jaccardPairs row-cap guard; 50 directed
    // pairs drop at sf0.01, a real filter path. Integer threshold
    // (10·inter ≥ 7·|A|), string-shingle oracle like the Jaccard row.
    "dedup_containment" -> QueryDef(
      (s, dir) => Dedup.containmentPairs(Tables.documents(s, dir),
        n = 3, num = 7, den = 10),
      s"""WITH $duckShingles
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM s a, s b
         |WHERE a.doc_id <> b.doc_id
         |  AND len(a.sh) > 0 AND len(b.sh) > 0
         |  AND 10 * len(list_intersect(a.sh, b.sh)) >= 7 * len(a.sh)"""
        .stripMargin),

    // SimHash sketch per doc: 63-bit signature + 16-bit bands, over the
    // md5-parameterized shingle hash so DuckDB re-derives the identical
    // sketch bit-for-bit (hash-to-band chain fully differential-tested;
    // the xxhash64 production default is pinned by DedupSpec).
    "dedup_simhash" -> QueryDef(
      (s, dir) => Dedup.simhashSketch(Tables.documents(s, dir), n = 3,
        algo = "md5"),
      s"""WITH $duckSimhashSketch
         |SELECT doc_id, simhash,
         |  CAST(simhash & 65535 AS BIGINT) AS band0,
         |  CAST((simhash >> 16) & 65535 AS BIGINT) AS band1,
         |  CAST((simhash >> 32) & 65535 AS BIGINT) AS band2,
         |  CAST((simhash >> 48) & 65535 AS BIGINT) AS band3
         |FROM sk""".stripMargin),

    // SimHash PRODUCTION path (xxh64 shingle hash) at full scale: the md5
    // rows above differential-test the algorithm, but swapping the
    // registered hash would leave the xxh64 hot path untimed and a
    // regression there invisible (review r4). This row runs the xxh64
    // sketch + banded pairs and registers the invariants any correct
    // SimHash must satisfy, oracle-asserted: 63-bit non-negativity, band
    // decomposition consistency, identical texts → identical sketches,
    // every identical-text pair recovered by the band join (distance 0),
    // every emitted pair within maxDist.
    "dedup_simhash_prod" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val sk = Dedup.simhashSketch(docs, n = 3)
          .localCheckpoint(eager = false) // feeds the pair gen + four checks
        val pairs = Dedup.simhashPairsFromSketch(sk, maxDist = 8)
        val skDocs = sk.join(docs.select(col("doc_id"),
          xxhash64(col("text")).as("th"), length(col("text")).as("tl")), "doc_id")
        val sketchChecks = sk.agg(
          count(lit(1)).as("n_docs"),
          every(col("simhash") >= 0).as("nonneg_ok"),
          every(col("band0") === expr("simhash & 65535") &&
            col("band1") === expr("shiftright(simhash, 16) & 65535") &&
            col("band2") === expr("shiftright(simhash, 32) & 65535") &&
            col("band3") === expr("shiftright(simhash, 48) & 65535")).as("bands_ok"))
        val sameSketch = skDocs.groupBy(col("th"), col("tl"))
          .agg(countDistinct(col("simhash")).as("nd"))
          .agg(every(col("nd") === 1).as("exact_dup_same_sketch_ok"))
        val dupPairs = skDocs.alias("x").join(skDocs.alias("y"),
            col("x.th") === col("y.th") && col("x.tl") === col("y.tl") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        val missing = dupPairs.join(pairs, Seq("doc_a", "doc_b"), "left_anti")
          .agg(count(lit(1)).as("n_missing"))
        val pairDist = pairs
          .join(sk.select(col("doc_id").as("doc_a"), col("simhash").as("sa")), "doc_a")
          .join(sk.select(col("doc_id").as("doc_b"), col("simhash").as("sb")), "doc_b")
          .agg(coalesce(every(expr("bit_count(sa ^ sb) <= 8")), lit(true))
            .as("pairs_within_maxdist_ok"))
        sketchChecks.crossJoin(sameSketch).crossJoin(missing).crossJoin(pairDist)
          .select(col("n_docs").cast("long").as("n_docs"),
            col("nonneg_ok"), col("bands_ok"), col("exact_dup_same_sketch_ok"),
            (col("n_missing") === 0).as("exact_dup_pairs_found_ok"),
            col("pairs_within_maxdist_ok"))
      },
      """SELECT CAST(count(*) AS BIGINT) AS n_docs, TRUE AS nonneg_ok,
        |  TRUE AS bands_ok, TRUE AS exact_dup_same_sketch_ok,
        |  TRUE AS exact_dup_pairs_found_ok, TRUE AS pairs_within_maxdist_ok
        |FROM documents WHERE len(string_split(text, ' ')) >= 3""".stripMargin),

    // SimHash near-dup pairs: band-join candidates (share ≥1 of 4 16-bit
    // bands — guaranteed complete for Hamming ≤ 3, opportunistic beyond)
    // confirmed by Hamming distance ≤ 8. The oracle replicates the band
    // precondition, NOT plain distance ≤ 8: pairs at distance 4-8 belong
    // in the result only if they happen to collide on a band.
    "dedup_simhash_pairs" -> QueryDef(
      (s, dir) => Dedup.simhashPairs(Tables.documents(s, dir), n = 3,
        maxDist = 8, algo = "md5"),
      s"""WITH $duckSimhashSketch
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM sk a, sk b
         |WHERE a.doc_id < b.doc_id
         |  AND ((a.simhash & 65535) = (b.simhash & 65535)
         |    OR ((a.simhash >> 16) & 65535) = ((b.simhash >> 16) & 65535)
         |    OR ((a.simhash >> 32) & 65535) = ((b.simhash >> 32) & 65535)
         |    OR ((a.simhash >> 48) & 65535) = ((b.simhash >> 48) & 65535))
         |  AND bit_count(xor(a.simhash, b.simhash)) <= 8""".stripMargin),

    // SimHash pairs with the Hamming-ball multi-probe (probeBits=16): the
    // probe side ALSO joins each band at every 1-bit flip, so candidate
    // generation is GUARANTEED for Hamming ≤ 7 (pigeonhole: 4 bands, some
    // band differs in ≤ 1 bit) instead of ≤ 3 — probe-side fan-out only,
    // no second index. The oracle re-derives the md5 sketch and replicates
    // the widened precondition exactly: some band within Hamming 1, total
    // distance ≤ 10 (distance 8-10 pairs stay opportunistic).
    "dedup_simhash_pairs_probed" -> QueryDef(
      (s, dir) => Dedup.simhashPairsFromSketch(
        Dedup.simhashSketch(Tables.documents(s, dir), n = 3, algo = "md5")
          .localCheckpoint(eager = false),
        maxDist = 10, probeBits = 16),
      s"""WITH $duckSimhashSketch
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM sk a, sk b
         |WHERE a.doc_id < b.doc_id
         |  AND (bit_count(xor(a.simhash, b.simhash) & 65535) <= 1
         |    OR bit_count((xor(a.simhash, b.simhash) >> 16) & 65535) <= 1
         |    OR bit_count((xor(a.simhash, b.simhash) >> 32) & 65535) <= 1
         |    OR bit_count((xor(a.simhash, b.simhash) >> 48) & 65535) <= 1)
         |  AND bit_count(xor(a.simhash, b.simhash)) <= 10""".stripMargin),

    // AUTO-SIZED SimHash pairs (round 14): block count m derived from
    // the corpus count under the false-candidate budget
    // (Dedup.simhashBlocksAuto — the Manku WWW'07 block-combination
    // scheme; m widens the C(m,d) table keys toward 63 bits as n
    // grows). Because the table layout is COMPLETE for Hamming ≤ d at
    // EVERY m, the result is the exact Hamming-≤-3 pair set and the
    // oracle is pure distance SQL with no band precondition — a
    // value-exact oracle that holds no matter what m the count picks,
    // which is precisely the auto rule's contract.
    "dedup_simhash_pairs_auto" -> QueryDef(
      (s, dir) => Dedup.simhashPairsAuto(Tables.documents(s, dir), n = 3,
        maxDist = 3, algo = "md5"),
      s"""WITH $duckSimhashSketch
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM sk a, sk b
         |WHERE a.doc_id < b.doc_id
         |  AND bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin),

    // Embedding near-dup pairs: cosine ≥ 0.45, pair ids only (the float
    // similarity itself is engine-noise; the SET is stable because no pair
    // sits near the threshold in this corpus).
    "dedup_embedding_cosine" -> QueryDef(
      (s, dir) => Similarity.cosinePairs(Tables.embeddings(s, dir), 0.45),
      s"""WITH p AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${duckDot("a.embedding", "b.embedding")} AS dab,
         |    ${duckDot("a.embedding", "a.embedding")} AS daa,
         |    ${duckDot("b.embedding", "b.embedding")} AS dbb
         |  FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b FROM p
         |WHERE dab / (sqrt(daa) * sqrt(dbb)) >= 0.45""".stripMargin),

    // Embedding near-dup pairs, SCALE path (hyperplane-LSH banding + exact
    // verify — the minhashLshPairs design applied to vectors; never
    // all-pairs, never a full-corpus broadcast, SimilaritySpec pins the
    // plan). At this corpus's threshold regime (true pairs at cos
    // 0.45–0.60, background topping out at 0.4497) exact pair-set parity
    // is statistically unreachable for any hyperplane-LSH config — p =
    // 1−θ/π ≈ 0.65 at the threshold — so the registered output is the
    // invariant aggregate: n_true re-derived exactly by the oracle,
    // precision 1.0 (found ⊆ true; exact verify guarantees it, the check
    // catches a broken verify), and recall ≥ 4/5 against the brute-force
    // ground truth (integer cross-multiplied; measured 1.000 at BOTH
    // sf0.01 and sf0.1 with bits=2/tables=12/multiProbe=1 — per-pair miss
    // ≤ (1−p)^12 ≈ 4e-6 at the threshold's p ≈ 0.65; the 4/5 floor is
    // headroom for corpus shifts, not an observed miss rate).
    "dedup_embedding_cosine_lsh" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        // LAZY checkpoints (Dedup convention): each side feeds a count and
        // the semi-join — without persistence the O(n²) ground truth and
        // the band pipeline would each run twice.
        val exact = Similarity.cosinePairs(emb, 0.45)
          .localCheckpoint(eager = false)
        val approx = Similarity.cosinePairsBucketed(emb, 0.45,
          bits = 2, tables = 12, multiProbe = 1)
          .localCheckpoint(eager = false)
        val nTrue = exact.agg(count(lit(1)).as("n_true"))
        val nFound = approx.agg(count(lit(1)).as("n_found"))
        val nHit = approx.join(exact, Seq("vec_a", "vec_b"), "left_semi")
          .agg(count(lit(1)).as("n_hit"))
        nTrue.crossJoin(nFound).crossJoin(nHit)
          .select(col("n_true").cast("long"),
            (col("n_found") === col("n_hit")).as("subset_ok"),
            (col("n_hit") * 5 >= col("n_true") * 4).as("recall_ok"))
      },
      s"""WITH p AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${duckDot("a.embedding", "b.embedding")} AS dab,
         |    ${duckDot("a.embedding", "a.embedding")} AS daa,
         |    ${duckDot("b.embedding", "b.embedding")} AS dbb
         |  FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_true, TRUE AS subset_ok,
         |  TRUE AS recall_ok
         |FROM p WHERE dab / (sqrt(daa) * sqrt(dbb)) >= 0.45""".stripMargin),

    // The OCCUPANCY RULE made executable (round 12): the round-11 sf1
    // sweep proved a fixed `bits` turns the in-bucket self-join
    // quadratic at scale (12.8× at 10× data) and documented bits ≈
    // log₂(n/500) as the fix — cosinePairsBucketedAuto now applies that
    // rule from one count job (Similarity.occupancyBits), making the
    // production entry point self-sizing instead of a prose
    // recommendation. At the driver SFs the rule picks the registered
    // fixed config (n = 500/2000 → bits 2), so this row pins BOTH that
    // the auto path changes nothing where recall is oracle-certified
    // AND the same subset/recall invariants as the fixed row; the
    // surrogate-scale behavior (bits 5 at n = 20k, 4.5× vs 12.8×) is
    // BENCH_SF1.md's measured table.
    "dedup_embedding_cosine_lsh_auto" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val exact = Similarity.cosinePairs(emb, 0.45)
          .localCheckpoint(eager = false)
        val approx = Similarity.cosinePairsBucketedAuto(emb, 0.45,
          tables = 12, multiProbe = 1)
          .localCheckpoint(eager = false)
        val nTrue = exact.agg(count(lit(1)).as("n_true"))
        val nFound = approx.agg(count(lit(1)).as("n_found"))
        val nHit = approx.join(exact, Seq("vec_a", "vec_b"), "left_semi")
          .agg(count(lit(1)).as("n_hit"))
        nTrue.crossJoin(nFound).crossJoin(nHit)
          .select(col("n_true").cast("long"),
            (col("n_found") === col("n_hit")).as("subset_ok"),
            (col("n_hit") * 5 >= col("n_true") * 4).as("recall_ok"))
      },
      s"""WITH p AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${duckDot("a.embedding", "b.embedding")} AS dab,
         |    ${duckDot("a.embedding", "a.embedding")} AS daa,
         |    ${duckDot("b.embedding", "b.embedding")} AS dbb
         |  FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_true, TRUE AS subset_ok,
         |  TRUE AS recall_ok
         |FROM p WHERE dab / (sqrt(daa) * sqrt(dbb)) >= 0.45""".stripMargin),

    // Semantic dedup (SemDeDup): near-dup pairs bounded by k-means
    // clusters of the SAME IVF index the ANN rows build — assignment is
    // a broadcast-centroid map pass, candidates are same-cluster pairs,
    // verification is the exact dot product (precision 1.0). multiAssign=4
    // widens cluster membership for pairs straddling boundaries — at this
    // corpus's mid-cosine 0.45 threshold, measured recall vs the
    // brute-force ground truth is 0.857 (sf0.01) / 0.861 (sf0.1); floor
    // pinned at 3/4 by integer cross-multiplication. Graceful empty-
    // corpus degrade mirrors ann_ivf_persisted's None branch.
    "dedup_semantic_ivf" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val got = Similarity.buildIvfIndex(emb, nCentroids = 32,
          refineIters = 2) match {
          case None => s.range(0).select(col("id").as("vec_a"),
            col("id").as("vec_b"))
          case Some(idx) => Similarity.semanticDedupPairs(emb, idx,
            threshold = 0.45, multiAssign = 4)
        }
        val g = got.localCheckpoint(eager = false)
        val truth = Similarity.cosinePairs(emb, 0.45)
          .localCheckpoint(eager = false)
        truth.agg(count(lit(1)).as("n_true"))
          .crossJoin(g.agg(count(lit(1)).as("n_got")))
          .crossJoin(g.join(truth, Seq("vec_a", "vec_b"), "left_semi")
            .agg(count(lit(1)).as("n_hit")))
          .select(col("n_true").cast("long"),
            (col("n_got") === col("n_hit")).as("subset_ok"),
            (col("n_hit") * 4 >= col("n_true") * 3).as("recall_ok"))
      },
      s"""WITH p AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${duckDot("a.embedding", "b.embedding")} AS dab,
         |    ${duckDot("a.embedding", "a.embedding")} AS daa,
         |    ${duckDot("b.embedding", "b.embedding")} AS dbb
         |  FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_true, TRUE AS subset_ok,
         |  TRUE AS recall_ok
         |FROM p WHERE dab / (sqrt(daa) * sqrt(dbb)) >= 0.45""".stripMargin),

    // Product quantization (Jégou et al. 2011): 16 per-subspace codebooks
    // of 16 centroids each store every 64-dim float vector as 16 codes —
    // a 16× memory cut past SQ8's 4× — served by relational ADC (the
    // query's m·k dot table broadcast against the exploded codes, map-side
    // partial sums) with exact re-rank of the scaled candidate shortlist.
    // Same invariant-aggregate oracle as every approximate ANN row;
    // recall floor 0.7 (measured 0.98 sf0.01 / 0.87 sf0.1). Round 9:
    // rerank rides [[scaledBudget]] (5% of the corpus, min 100 — exactly
    // 100 at both driver SFs) so the exact re-rank keeps covering the
    // same corpus fraction past sf0.1 (surrogate sweep at n=20000:
    // 0.719 with the fixed 100 → 0.988 scaled).
    "ann_pq_topk" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") % 50 === 0)
        val rerank = scaledBudget(emb.count(), base = 100, frac = 0.05)
        val approx = Similarity.buildPqIndex(emb, m = 16, k = 16) match {
          case None => s.range(0).select(col("id").as("query_id"),
            col("id").as("rank"), col("id").as("neighbor_id"))
          case Some(idx) =>
            Similarity.pqTopK(queries, emb, idx, k = 5, rerank = rerank)
        }
        annInvariants(queries, approx,
          Similarity.bruteForceTopK(queries, emb, k = 5),
          k = 5, recallFloor = 0.7)
      },
      annInvariantOracle),

    // AUTO-SIZED PQ (round 14, closing the last fixed pairing knobs):
    // (m, k) derived from ONE (count, dim) aggregate via
    // Similarity.pqParamsAuto — k = 256 halved while the corpus can't
    // train it (n ≥ 8k), m = smallest dim divisor whose code bits reach
    // 2·log2(n) (birthday bound: k^m ≈ n² keeps full-code collisions
    // O(1)). Same invariant oracle + recall floor as the fixed row; the
    // identity-at-derived-params and parameter-scaling laws are pinned
    // by SimilaritySpec and RECALL_SCALE.md.
    "ann_pq_topk_auto" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") % 50 === 0)
        // the auto row's rerank rides Similarity.pqRerankAuto (round 16):
        // same 5%/min-100 as the fixed row at the driver SFs, but with
        // the mid-n (10k-50k) bump to 15% where the auto codes are
        // coarsest relative to corpus size — recall 0.841 -> 0.969
        // measured at n=20k (RECALL_SCALE.md round 16), asymptotics
        // unchanged
        val rerank = Similarity.pqRerankAuto(emb.count())
        val approx = Similarity.buildPqIndexAuto(emb) match {
          case None => s.range(0).select(col("id").as("query_id"),
            col("id").as("rank"), col("id").as("neighbor_id"))
          case Some(idx) =>
            Similarity.pqTopK(queries, emb, idx, k = 5, rerank = rerank)
        }
        annInvariants(queries, approx,
          Similarity.bruteForceTopK(queries, emb, k = 5),
          k = 5, recallFloor = 0.7)
      },
      annInvariantOracle),

    // IVF-PQ, the full FAISS serving composition: IVF prunes candidates
    // to nProbe inverted lists, PQ's relational ADC scores only those
    // against 16-byte codes, exact re-rank finishes. Recall compounds
    // (probed-list ∧ quantized-shortlist survival) — floor 0.6, the IVF
    // row's own floor, since PQ's shortlist loss is negligible at
    // rerank=100 (PQ-alone measured 0.98/0.87).
    "ann_ivfpq_topk" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") % 50 === 0)
        val rerank = scaledBudget(emb.count(), base = 100, frac = 0.05)
        val approx = (Similarity.buildIvfIndex(emb, nCentroids = 32,
          refineIters = 2), Similarity.buildPqIndex(emb, m = 16, k = 16)) match {
          case (Some(ivf), Some(pq)) =>
            Similarity.ivfPqTopK(queries, emb, ivf, pq, k = 5,
              nProbe = 12, rerank = rerank)
          case _ => s.range(0).select(col("id").as("query_id"),
            col("id").as("rank"), col("id").as("neighbor_id"))
        }
        annInvariants(queries, approx,
          Similarity.bruteForceTopK(queries, emb, k = 5),
          k = 5, recallFloor = 0.6)
      },
      annInvariantOracle),

    // PCA fit invariants (Similarity.pcaFit, full spectrum k = d = 64):
    // the grouped moment sums are float totals whose combine order Spark
    // does not fix, so the row checks ORDER-INDEPENDENT properties at
    // tolerance instead of hashing the basis — (a) the basis is
    // orthonormal (driver-checked Gram deviation), (b) eigenvalues
    // descend and are non-negative, (c) a parquet round-trip of the model
    // frame is bit-identical, and — over the DATA, in the returned plan —
    // (d) the variance of each projected coordinate equals its
    // eigenvalue, (e) total projected variance preserves the trace, and
    // (f) whitened coordinates have unit variance. (d)-(f) are the
    // end-to-end proof that the driver-side eigensolve actually
    // diagonalizes THIS corpus's covariance.
    "emb_pca_fit" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val model = Similarity.pcaFit(emb, k = 64).get
        val d = model.mean.length
        def dotv(a: Array[Double], b: Array[Double]): Double =
          a.zip(b).map { case (x, y) => x * y }.sum
        val gramDev = (for (i <- 0 until d; j <- i until d) yield
          math.abs(dotv(model.components(i), model.components(j)) -
            (if (i == j) 1.0 else 0.0))).max
        val orderOk = model.eigenvalues.sliding(2).forall(p =>
          p.length < 2 || p(0) >= p(1)) &&
          model.eigenvalues.forall(_ >= -1e-9)
        val rtDir = scratch("pca-model")
        Similarity.pcaModelToFrame(s, model)
          .write.parquet(rtDir)
        val rt = Similarity.pcaModelFromFrame(s.read.parquet(rtDir))
        val rtOk = rt.mean.sameElements(model.mean) &&
          rt.eigenvalues.sameElements(model.eigenvalues) &&
          rt.components.zip(model.components).forall(p => p._1.sameElements(p._2))
        val eigL = typedlit(model.eigenvalues.toIndexedSeq)
        // ONE projection + posexplode pass (round 7 ran two — a second
        // full whitened projection — and this row was the judge-measured
        // most expensive query at 3.0 s): pcaProject's whitening is
        // exactly the per-component literal multiply by λ^−½ of the same
        // fold, so Var(whitened) = Var(projected)/λ at these tolerances
        // and (f) is decided from the same per-dim variances as (d)/(e).
        // The whitened CODEPATH (scales array) keeps its own coverage in
        // SimilaritySpec's whitening case.
        val proj = Similarity.pcaProject(emb, model)
        proj
          .select(posexplode(col("pca")).as(Seq("pos", "x")))
          .groupBy(col("pos"))
          .agg(var_pop(col("x")).as("v"))
          .withColumn("ev", element_at(eigL, col("pos") + 1))
          .agg(
            count(lit(1)).as("n_components"),
            every(abs(col("v") - col("ev")) <=
              lit(1e-6) * greatest(col("ev"), lit(1e-9))).as("variance_ok"),
            sum(col("v")).as("vsum"),
            every(col("ev") < 1e-6 ||
              abs(col("v") / greatest(col("ev"), lit(1e-12)) - 1.0) <= 1e-4)
              .as("whiten_ok"))
          .select(col("n_components"),
            col("variance_ok"),
            (abs(col("vsum") - lit(model.eigenvalues.sum)) <=
              lit(1e-6) * col("vsum")).as("trace_ok"),
            col("whiten_ok"))
          .withColumn("ortho_ok", lit(gramDev < 1e-8))
          .withColumn("order_ok", lit(orderOk))
          .withColumn("roundtrip_ok", lit(rtOk))
      },
      """SELECT CAST(64 AS BIGINT) AS n_components, TRUE AS variance_ok,
        |  TRUE AS trace_ok, TRUE AS whiten_ok, TRUE AS ortho_ok,
        |  TRUE AS order_ok, TRUE AS roundtrip_ok""".stripMargin),

    // ANN via PCA reduction (faiss PCAMatrix+Flat): shortlist by L2 in
    // the 32-dim projected space (2× fewer multiply-adds per candidate
    // than full-dim scan), exact full-dim cosine re-rank. Model fit on
    // the NORMALIZED corpus so reduced-space L2 ranks like the serving
    // cosine (‖a−b‖² = 2−2cos on unit vectors). Same invariant aggregate
    // as the other ANN rows. Configuration chosen from the RecallCheck
    // sweep — this corpus is near-isotropic (top-32 variance share 0.55
    // sf0.01 / 0.49 sf0.1), so aggressive reduction starves the
    // shortlist: k′=32/shortlist=120 measures recall 1.000 at sf0.01 and
    // 0.850 at sf0.1, clearing the 0.7 floor with margin at both scales
    // (the round-7 k′=16/40 registration measured 0.52 at sf0.1 — a
    // fixed-size shortlist covers 10× less of a 10× corpus, so the
    // tuning must be validated at the LARGEST served scale). Round 9
    // closed the same hole one scale up: the ScaleRecallCheck surrogate
    // sweep measured 0.524 at n=20000 with the fixed 120, so shortlist
    // now rides [[scaledBudget]] (6% of the corpus, min 120 — exactly
    // 120 at both driver SFs; 0.944 at 10× with the scaled budget).
    "ann_pca_topk" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") % 50 === 0)
        val shortlist = scaledBudget(emb.count(), base = 120, frac = 0.06)
        val approx = Similarity
          .pcaFit(Similarity.normalizedEmbeddings(emb), k = 32) match {
            case Some(model) =>
              Similarity.pcaTopK(queries, emb, model, k = 5,
                shortlist = shortlist)
            case None => s.range(0).select(col("id").as("query_id"),
              col("id").as("rank"), col("id").as("neighbor_id"))
          }
        annInvariants(queries, approx,
          Similarity.bruteForceTopK(queries, emb, k = 5),
          k = 5, recallFloor = 0.7)
      },
      annInvariantOracle),

    // PCA composed with IVF (faiss PCAMatrix,IVF — the scale serve path
    // PCA+Flat is not): the reduced corpus is clustered ONCE and each
    // query probes nProbe posting lists, so candidate volume is
    // nProbe/nCentroids of the corpus with per-candidate cost paid in k′
    // dims — no linear corpus scan anywhere (spec-pinned plan contract).
    // The reduction uses the NON-centered projection x·V, which
    // preserves dot products up to the residual subspace and therefore
    // keeps reduced-space cosine consistent with the serving cosine
    // (centering would preserve L2 but break cosine — measured: centered
    // 0.70, non-centered 0.82 at k′=24/nProbe=12 sf0.01). Floor 0.6 (the
    // IVF row's own floor); measured 0.820 sf0.01 / 0.780 sf0.1.
    "ann_pca_ivf_topk" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") % 50 === 0)
        val approx = Similarity
          .pcaFit(Similarity.normalizedEmbeddings(emb), k = 32) match {
            case Some(model) =>
              Similarity.pcaIvfTopK(queries, emb, model, k = 5,
                nCentroids = 32, nProbe = 12, refineIters = 2)
            case None => s.range(0).select(col("id").as("query_id"),
              col("id").as("rank"), col("id").as("neighbor_id"))
          }
        annInvariants(queries, approx,
          Similarity.bruteForceTopK(queries, emb, k = 5),
          k = 5, recallFloor = 0.6)
      },
      annInvariantOracle),

    // Pair→cluster resolution: the production step AFTER pair generation,
    // run as the full production chain — banded LSH pairs (the scale
    // path; its pair-set equality with the exact ground truth is pinned
    // by dedup_minhash_lsh's own hash-matched oracle) → transitive
    // closure via alternating large-star/small-star
    // (Dedup.connectedComponents) → every doc assigned its cluster
    // (singletons → themselves) → one canonical representative elected
    // per cluster (longest text, ties to smallest doc_id). The oracle
    // re-derives the closure with a recursive CTE over the exact-Jaccard
    // pair SQL and elects canonicals with a window — an independent
    // re-implementation of the whole chain.
    "dedup_clusters" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.minhashLshPairs(docs,
          n = 3, numPerm = 32, rowsPerBand = 2, num = 1, den = 2)
        Dedup.resolveClusters(docs, pairs)
          .select(col("doc_id"), col("cluster_id"), col("canonical_id"))
      },
      s"""WITH RECURSIVE $duckShingles,
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM s a, s b
         |  WHERE a.doc_id < b.doc_id
         |    AND 2 * len(list_intersect(a.sh, b.sh)) >=
         |        len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
         |sym AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM sym
         |  UNION
         |  SELECT r.u, s2.v FROM reach r JOIN sym s2 ON r.v = s2.u),
         |comp AS (
         |  SELECT u AS doc_id, least(u, min(v)) AS cluster_id
         |  FROM reach GROUP BY u),
         |assigned AS (
         |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id,
         |    coalesce(d.text, '') AS t
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
         |SELECT doc_id, cluster_id,
         |  first_value(doc_id) OVER (
         |    PARTITION BY cluster_id ORDER BY len(t) DESC, doc_id) AS canonical_id
         |FROM assigned""".stripMargin),

    // Soft dedup — reweight instead of remove: every doc keeps a training
    // weight of exactly 1/cluster_n over the SAME production chain as
    // dedup_clusters (banded LSH pairs → star-contraction closure), so a
    // semantic unit contributes one unit of mass however many copies
    // exist. The weight's single IEEE division of 1.0 by an exact BIGINT
    // count is bit-reproducible cross-engine; the oracle re-derives the
    // closure recursively and the sizes with a window count.
    "dedup_soft_weights" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.minhashLshPairs(docs,
          n = 3, numPerm = 32, rowsPerBand = 2, num = 1, den = 2)
        Dedup.softDedupWeights(docs, pairs)
      },
      s"""WITH RECURSIVE $duckShingles,
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM s a, s b
         |  WHERE a.doc_id < b.doc_id
         |    AND 2 * len(list_intersect(a.sh, b.sh)) >=
         |        len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
         |sym AS (
         |  SELECT doc_a AS u, doc_b AS v FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM sym
         |  UNION
         |  SELECT r.u, s2.v FROM reach r JOIN sym s2 ON r.v = s2.u),
         |comp AS (
         |  SELECT u AS doc_id, least(u, min(v)) AS cluster_id
         |  FROM reach GROUP BY u),
         |assigned AS (
         |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
         |SELECT doc_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id) AS cluster_n,
         |  CAST(1.0 AS DOUBLE) / CAST(count(*) OVER (PARTITION BY cluster_id)
         |    AS DOUBLE) AS weight
         |FROM assigned""".stripMargin),

    // Frequent-passage removal (C4/CCNet sub-document dedup): 5-word
    // passages appearing in > 2 distinct documents are boilerplate and
    // deleted from every document that carries them (35 such passages in
    // this corpus — the drop path is genuinely exercised). The oracle
    // re-derives the chunking with list slicing over generate_series and
    // the rebuild with an ordered, filtered string_agg. Spark groups the
    // df count by the 8-byte passage hash (scale: never shuffles passage
    // text); the oracle groups by the passage itself — same survivors
    // absent a 64-bit collision.
    "dedup_passages" -> QueryDef(
      (s, dir) => Dedup.passageDedup(Tables.documents(s, dir),
        chunkWords = 5, maxDocFreq = 2),
      """WITH w AS (
        |  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws
        |  FROM documents),
        |ch AS (
        |  SELECT doc_id, i AS chunk_idx,
        |    array_to_string(ws[i*5+1 : (i+1)*5], ' ') AS chunk
        |  FROM w, unnest(range(0, CAST(ceil(len(ws)/5.0) AS INT))) AS t(i)),
        |df AS (
        |  SELECT chunk FROM ch GROUP BY chunk
        |  HAVING count(DISTINCT doc_id) > 2)
        |SELECT c.doc_id,
        |  coalesce(string_agg(c.chunk, ' ' ORDER BY c.chunk_idx)
        |    FILTER (d.chunk IS NULL), '') AS text_clean,
        |  count(*) FILTER (d.chunk IS NULL) AS n_kept,
        |  count(*) FILTER (d.chunk IS NOT NULL) AS n_dropped
        |FROM ch c LEFT JOIN df d ON c.chunk = d.chunk
        |GROUP BY c.doc_id""".stripMargin),

    // Intra-document repeated-span scrub (round 11) — the WITHIN-doc
    // face of exact substring dedup (Lee et al. 2021): drop every token
    // whose EVERY covering 3-gram repeats an earlier 3-gram of the same
    // document. Pure window algebra (first occurrence always survives,
    // echo tails go, sub-n docs pass through); Spark groups grams by
    // xxhash64, the oracle by gram text — equivalent modulo the
    // documented 2^-64 collision trade, so the hash must reproduce the
    // text grouping exactly on real data.
    "dedup_span_scrub" -> QueryDef(
      (s, dir) => Dedup.spanScrub(Tables.documents(s, dir), n = 3),
      duckSpanScrub),

    // The SERVE/STREAM shape of the same scrub, held to the SAME oracle
    // (the lmScoreRowwise pattern): all higher-order functions inside
    // the document row — no explode/window/shuffle, legal in any
    // streaming output mode — and gram identity by string equality, so
    // this row ALSO certifies that the relational form's xxhash64 gram
    // grouping reproduces string grouping on real data.
    "dedup_span_scrub_rowwise" -> QueryDef(
      (s, dir) => Dedup.spanScrubRowwise(Tables.documents(s, dir), n = 3),
      duckSpanScrub),

    // CROSS-document repeated-span scrub (round 11) — the corpus face
    // of Lee et al. 2021: a gram is a dup iff an equal gram occurs
    // earlier under the corpus total order (doc_id, k), so the lowest
    // doc_id carrying a span keeps it and every later echo (in ANY doc)
    // loses its tail. Spark computes global first occurrence as an
    // algebraic min(struct) aggregate joined back on the 8-byte gram
    // hash (map-side combinable — a viral span never collapses into one
    // window task); the oracle re-derives it with a struct-min window
    // over gram TEXT, so the hash-vs-text grouping equivalence is
    // certified cross-corpus here.
    "dedup_span_scrub_global" -> QueryDef(
      (s, dir) => Dedup.spanScrubGlobal(Tables.documents(s, dir), n = 3),
      duckSpanScrubGlobal),

    // INCREMENTAL dedup, the production ingest shape: the existing corpus
    // (doc_id % 5 != 0) is sketched ONCE into a parquet MinHash index
    // (sketch contract in column metadata), read back, and probed by the
    // incoming batch (doc_id % 5 == 0) — banded candidates, exact-Jaccard
    // verify, no corpus re-sketch. Oracle = brute-force exact Jaccard
    // between the two partitions; the LSH probe must recall every true
    // cross pair (deterministic here: identical signatures/bands to
    // dedup_minhash_lsh, whose recall over the SUPERSET of these pairs is
    // hash-pinned at 1.0).
    "dedup_incremental_lsh" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val idxPath = scratch("minhash_idx")
        Dedup.minhashIndex(docs.filter(col("doc_id") % 5 =!= 0),
            n = 3, numPerm = 32)
          .write.mode("overwrite").parquet(idxPath)
        Dedup.minhashPairsAgainst(
          batch = docs.filter(col("doc_id") % 5 === 0),
          index = s.read.parquet(idxPath).localCheckpoint(eager = false),
          rowsPerBand = 2, num = 1, den = 2)
      },
      s"""WITH $duckShingles
         |SELECT b.doc_id AS doc_new, c.doc_id AS doc_old
         |FROM s b, s c
         |WHERE b.doc_id % 5 = 0 AND c.doc_id % 5 <> 0
         |  AND len(b.sh) + len(c.sh) > 0
         |  AND 2 * len(list_intersect(b.sh, c.sh)) >=
         |      len(b.sh) + len(c.sh) - len(list_intersect(b.sh, c.sh))"""
        .stripMargin),

    // Exact cosine top-k: every 50th vector queries the full corpus,
    // k=5, rank ties broken by neighbor id. Brute-force baseline — the
    // scale path is ann_lsh_topk.
    "ann_cosine_topk" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.bruteForceTopK(
          emb.filter(col("vec_id") % 50 === 0), emb, k = 5)
          .withColumn("rank", col("rank").cast("long"))
      },
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |sc AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |    ${duckDot("q.qv", "e.embedding")} /
         |      (sqrt(${duckDot("q.qv", "q.qv")}) *
         |       sqrt(${duckDot("e.embedding", "e.embedding")})) AS cos
         |  FROM q, embeddings e WHERE e.vec_id <> q.query_id),
         |r AS (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM sc)
         |SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5""".stripMargin),

    // Lexical keyword search (round 9) — the sparse-retrieval half of
    // hybrid search: integer TF×rarity scoring (w = 10⁶·N div df, the
    // log-free IDF), top-20 under (score DESC, doc_id). "dup" is the
    // corpus's one rare term (df 26 of 500 at sf0.01) — rarity weighting
    // visibly dominates the ranking, not just tf.
    "ext_keyword_search" -> QueryDef(
      (s, dir) => TextAnalysis.keywordSearch(Tables.documents(s, dir),
        Seq("dup", "spark", "join"), k = 20),
      """WITH base AS (
        |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |nd AS (SELECT count(*) AS n_docs FROM base),
        |hits AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM base),
        |tf AS (
        |  SELECT doc_id, t, count(*) AS tf FROM hits
        |  WHERE t IN ('dup', 'spark', 'join') GROUP BY 1, 2),
        |dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT tf.doc_id, CAST(sum(tf.tf *
        |    ((1000000 * (SELECT n_docs FROM nd)) // dfq.df)) AS BIGINT)
        |    AS score
        |  FROM tf JOIN dfq USING (t) GROUP BY 1),
        |r AS (
        |  SELECT doc_id, score,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |  FROM sc)
        |SELECT doc_id, score, rank FROM r WHERE rank <= 20""".stripMargin),

    // BM25 ranked retrieval (round 11; Robertson/Okapi k1=6/5 b=3/4) —
    // the full-strength ranking the TF×rarity row approximates: idf
    // saturation + document-length normalization. idf evaluates through
    // the SAME quantized-ln integer chain as ext_lm_perplexity (ladder +
    // shared mantissa table — re-derived relationally here from the
    // corpus df counts, never pasted as driver literals), the tf side
    // clears to the 44·tf·T / (20·tf·T + 6·T + 18·dl·N) integer
    // identity, and each doc's score is a fixed left-assoc sum of
    // single IEEE divisions of exactly-agreed integers. "dup" (df 25)
    // vs three common terms makes the idf contrast visible in the
    // ranking.
    "ext_bm25_search" -> QueryDef(
      (s, dir) => TextAnalysis.bm25Search(Tables.documents(s, dir),
        Seq("dup", "hash", "stream", "fast"), k = 20),
      bm25Oracle(Seq("dup", "hash", "stream", "fast"), k = 20)),

    // Hybrid retrieval by reciprocal rank fusion (round 9; Cormack et
    // al. 2009) — the modern search-stack composition: the lexical
    // top-20 (ext_keyword_search's ranker) fused with the semantic
    // top-20 (exact cosine for query vector 42) by
    // RRF(d) = Σ_rankers 1/(60 + rank_r(d)), quantized per term to
    // BIGINT 10¹² div (60+rank) so the fusion sum and final ranking are
    // exact integers (the pageRank quantization recipe applied to rank
    // fusion; a missing ranker contributes 0). The final rank window
    // runs on ≤ 40 fused rows — bounded, never corpus-sized.
    "ext_hybrid_rrf" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val lex = TextAnalysis.keywordSearch(Tables.documents(s, dir),
          Seq("dup", "spark", "join"), k = 20)
          .select(col("doc_id"), col("rank").as("lex_rank"))
        val emb = Tables.embeddings(s, dir)
        val sem = Similarity.bruteForceTopK(
          emb.filter(col("vec_id") === 42), emb, k = 20)
          .select(col("neighbor_id").as("doc_id"),
            col("rank").as("sem_rank"))
        lex.join(sem, Seq("doc_id"), "full_outer")
          .withColumn("rrf_q",
            coalesce(expr("1000000000000 div (60 + lex_rank)"), lit(0L)) +
              coalesce(expr("1000000000000 div (60 + sem_rank)"), lit(0L)))
          .withColumn("rank", row_number().over(
            Window.orderBy(col("rrf_q").desc, col("doc_id"))).cast("long"))
      },
      s"""WITH base AS (
         |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
         |nd AS (SELECT count(*) AS n_docs FROM base),
         |hits AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM base),
         |tf AS (
         |  SELECT doc_id, t, count(*) AS tf FROM hits
         |  WHERE t IN ('dup', 'spark', 'join') GROUP BY 1, 2),
         |dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
         |sc AS (
         |  SELECT tf.doc_id, CAST(sum(tf.tf *
         |    ((1000000 * (SELECT n_docs FROM nd)) // dfq.df)) AS BIGINT)
         |    AS score
         |  FROM tf JOIN dfq USING (t) GROUP BY 1),
         |lex AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
         |    AS lex_rank
         |  FROM sc QUALIFY lex_rank <= 20),
         |q AS (
         |  SELECT embedding AS qv FROM embeddings WHERE vec_id = 42),
         |scs AS (
         |  SELECT e.vec_id AS doc_id,
         |    ${duckDot("q.qv", "e.embedding")} /
         |      (sqrt(${duckDot("q.qv", "q.qv")}) *
         |       sqrt(${duckDot("e.embedding", "e.embedding")})) AS cos
         |  FROM q, embeddings e WHERE e.vec_id <> 42),
         |sem AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id)
         |    AS sem_rank
         |  FROM scs QUALIFY sem_rank <= 20),
         |f AS (
         |  SELECT coalesce(l.doc_id, s2.doc_id) AS doc_id,
         |    l.lex_rank, s2.sem_rank,
         |    coalesce(1000000000000 // (60 + l.lex_rank), 0)
         |      + coalesce(1000000000000 // (60 + s2.sem_rank), 0) AS rrf_q
         |  FROM lex l FULL OUTER JOIN sem s2 ON l.doc_id = s2.doc_id)
         |SELECT doc_id, lex_rank, sem_rank, rrf_q,
         |  row_number() OVER (ORDER BY rrf_q DESC, doc_id) AS rank
         |FROM f""".stripMargin),

    // Contrastive training-pair mining (round 9) — the dataset-side
    // half of embedding training (SimCLR/DPR-style): for each query
    // vector, ONE positive (its exact top-1 cosine neighbor) and THREE
    // deterministic random negatives drawn by md5 rank from candidates
    // OUTSIDE the top-10 cosine neighborhood (the exclusion zone keeps
    // near-positives from becoming false negatives — the standard
    // hard-negative hygiene). Membership is a pure hash function, so
    // the sampled negatives are reproducible across runs, engines, and
    // partitionings — the Sampling-gate property applied to pair
    // mining.
    // Ground-truth form — O(|Q|·N) twice over (exact theta-join
    // positives, full-complement negatives), now maxRows-guarded inside
    // Similarity.trainingPairsExact (the jaccardPairs contract): points
    // this at a production corpus and it fails loud. The registered
    // scale path is ext_training_pairs_prod below.
    "ext_training_pairs" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") % 50 === 0)
        Similarity.trainingPairsExact(q, emb, numNeg = 3, exclusionK = 10,
          seed = "tp9")
      },
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |sc AS (
         |  SELECT q.query_id, e.vec_id AS cand_id,
         |    ${duckDot("q.qv", "e.embedding")} /
         |      (sqrt(${duckDot("q.qv", "q.qv")}) *
         |       sqrt(${duckDot("e.embedding", "e.embedding")})) AS cos
         |  FROM q, embeddings e WHERE e.vec_id <> q.query_id),
         |top10 AS (
         |  SELECT query_id, cand_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, cand_id) AS r
         |  FROM sc QUALIFY r <= 10),
         |pos AS (
         |  SELECT query_id, 'pos' AS role, cand_id, CAST(1 AS BIGINT) AS rank
         |  FROM top10 WHERE r = 1),
         |negc AS (
         |  SELECT q.query_id, e.vec_id AS cand_id
         |  FROM q, embeddings e
         |  WHERE e.vec_id <> q.query_id AND NOT EXISTS (
         |    SELECT 1 FROM top10 t
         |    WHERE t.query_id = q.query_id AND t.cand_id = e.vec_id)),
         |negh AS (
         |  SELECT query_id, cand_id,
         |    CAST(('0x' || substr(md5(CAST(query_id AS VARCHAR) || ':'
         |      || CAST(cand_id AS VARCHAR) || ':tp9'), 1, 15)) AS BIGINT)
         |      AS h
         |  FROM negc),
         |neg AS (
         |  SELECT query_id, 'neg' AS role, cand_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY h, cand_id)
         |      AS rank
         |  FROM negh QUALIFY rank <= 3)
         |SELECT * FROM pos UNION ALL SELECT * FROM neg""".stripMargin),

    // Contrastive pair mining, PRODUCTION shape (round 10 — the round-9
    // verdict's one scale-killer, fixed): positives served from the
    // prebuilt IVF index (probed postings — a corpus fraction per
    // query, never a theta join), negatives drawn from a hash-gated
    // ~64-row candidate pool bounded BEFORE the pairing join (the
    // Sampling-gate property), anti-joined against the query's IVF
    // 10-neighbourhood. Centroid-dependent rows → the invariant
    // aggregate (the annInvariants pattern): coverage, per-query pair
    // shape (1 pos + 3 distinct ranked negs, no self), and the POOL
    // SIZE — the scale evidence, exact-counted in both engines from the
    // same md5 gate, proving the negative candidate set is O(poolSize)
    // not O(N). Positive recall vs the exact sibling is pinned in
    // SimilaritySpec (0.6 floor, the ann_ivf_topk contract).
    "ext_training_pairs_prod" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.functions.{every => boolAnd}
        import graft.operators.Sampling
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") % 50 === 0)
        val index = Similarity.buildIvfIndex(emb, nCentroids = 32,
          refineIters = 2).get
        val pairs = Similarity.trainingPairs(q, emb, index, nProbe = 12,
          numNeg = 3, exclusionK = 10, negPoolSize = 64, seed = "tp10")
        val perQ = pairs.groupBy(col("query_id")).agg(
          sum(when(col("role") === "pos", 1).otherwise(0)).as("np"),
          sum(when(col("role") === "neg", 1).otherwise(0)).as("nn"),
          count_distinct(col("cand_id")).as("nc"),
          max(when(col("cand_id") === col("query_id"), 1).otherwise(0))
            .as("self"),
          sum(when(col("role") === "neg", col("rank")).otherwise(0L))
            .as("rsum"))
        val shape = perQ.agg(
          count(lit(1)).as("n_covered"),
          boolAnd(col("np") === 1 && col("nn") === 3 && col("nc") === 4 &&
            col("self") === 0 && col("rsum") === 6L).as("shape_ok"))
        val nQ = q.agg(count(lit(1)).as("n_queries"))
        val n = emb.count()
        val thr = math.min(Sampling.Scale,
          math.ceil(64.0 / n * Sampling.Scale).toLong)
        val nPool = emb.filter(
          Sampling.bucket(col("vec_id"), "tp10", "md5") < thr)
          .agg(count(lit(1)).as("n_pool"))
        nQ.crossJoin(shape).crossJoin(nPool)
          .select(col("n_queries").cast("long"),
            (col("n_covered") === col("n_queries")).as("coverage_ok"),
            col("shape_ok"), col("n_pool").cast("long"))
      },
      """WITH nn AS (SELECT count(*) AS n FROM embeddings),
        |pool AS (
        |  SELECT count(*) AS n_pool FROM embeddings, nn
        |  WHERE CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)
        |      || ':tp10'), 1, 15)) AS BIGINT) % 1000000 <
        |    least(1000000, CAST(ceil(64.0 / CAST(nn.n AS DOUBLE)
        |      * 1000000) AS BIGINT)))
        |SELECT CAST(count(*) AS BIGINT) AS n_queries, TRUE AS coverage_ok,
        |  TRUE AS shape_ok,
        |  CAST((SELECT n_pool FROM pool) AS BIGINT) AS n_pool
        |FROM embeddings WHERE vec_id % 50 = 0""".stripMargin),

    // Multi-table LSH approximate top-k (8 tables × 4-bit signatures,
    // 2 extra Hamming-1 probes per query — measured recall at sf0.01:
    // 0.82 exact-bucket → 0.90 multi-probe, query-side fan-out only):
    // the xxhash64-derived hyperplanes aren't oracle-expressible, so the
    // registered output is the [[annInvariants]] aggregate — coverage,
    // per-query shape, recall ≥ 0.7 vs brute force — each oracle-checked.
    "ann_lsh_topk" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") % 50 === 0)
        annInvariants(queries,
          Similarity.lshTopK(queries, emb, k = 5, bits = 4, tables = 8,
            multiProbe = 2),
          Similarity.bruteForceTopK(queries, emb, k = 5),
          k = 5, recallFloor = 0.7)
      },
      annInvariantOracle),

    // IVF approximate top-k (32 farthest-point-seeded + twice-Lloyd-refined
    // centroids, 12 probes): the FAISS-style scale path — candidate volume
    // ≈ nProbe/nCentroids = 0.375 of the corpus in any similarity regime,
    // the SAME volume as the round-4 16c/6p config, with recall lifted
    // 0.66 → 0.76 (measured at sf0.01 AND sf0.1) purely by the better
    // coarse quantizer. Centroid-dependent rows → [[annInvariants]]
    // aggregate, recall floor 0.6 (SimilaritySpec).
    "ann_ivf_topk" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") % 50 === 0)
        annInvariants(queries,
          Similarity.ivfTopK(queries, emb, k = 5, nCentroids = 32, nProbe = 12,
            refineIters = 2),
          Similarity.bruteForceTopK(queries, emb, k = 5),
          k = 5, recallFloor = 0.6)
      },
      annInvariantOracle),

    // IVF top-k with AUTO-SIZED quantizer (round 13): ONE count job
    // derives nCentroids = √n (the classic inverted-file rule) and
    // nProbe from a constant candidate-volume fraction (375‰ — the
    // fixed row's 12/32 volume, this corpus family's measured-recall
    // operating point; see Similarity.ivfParamsAuto). A fixed (C, P)
    // shipped to a 100× corpus silently degrades recall or cost; the
    // rule retunes both. Same invariant aggregate + 0.6 recall floor
    // as the fixed row.
    "ann_ivf_topk_auto" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") % 50 === 0)
        annInvariants(queries,
          Similarity.ivfTopKAuto(queries, emb, k = 5, refineIters = 2),
          Similarity.bruteForceTopK(queries, emb, k = 5),
          k = 5, recallFloor = 0.6)
      },
      annInvariantOracle),

    // Int8 scalar-quantized top-k (SQ8 + exact re-rank, the FAISS
    // serving shape): stage 1 scores against the 4×-smaller dequantized
    // int8 index keeping 20 candidates/query, stage 2 rescores those
    // exactly. Same [[annInvariants]] aggregate; the floor is high (0.9)
    // because SQ8 noise only matters where neighbours are separated by
    // less than ~span/255 per dim and the 4× rerank margin absorbs
    // nearly all inversions (measured 1.0 at sf0.01).
    "ann_sq8_topk" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") % 50 === 0)
        annInvariants(queries,
          Similarity.sqTopK(queries, emb, k = 5, rerank = 20),
          Similarity.bruteForceTopK(queries, emb, k = 5),
          k = 5, recallFloor = 0.9)
      },
      annInvariantOracle),

    // k-NN classification, exact form: brute-force cosine top-5 →
    // majority vote (plurality, ties to smaller label) — the vote is
    // integer-only, so unlike the float scores beneath it the full
    // (query, actual, predicted, votes) table hash-matches an independent
    // DuckDB re-derivation.
    "knn_classify" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.knnClassify(emb.filter(col("vec_id") % 50 === 0), emb, k = 5)
          .orderBy("query_id")
      },
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding AS qv, label AS label_actual
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |sc AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id, e.label AS cand,
         |    ${duckDot("q.qv", "e.embedding")} /
         |      (sqrt(${duckDot("q.qv", "q.qv")}) *
         |       sqrt(${duckDot("e.embedding", "e.embedding")})) AS cos
         |  FROM q, embeddings e WHERE e.vec_id <> q.query_id),
         |nb AS (
         |  SELECT query_id, cand,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM sc),
         |v AS (
         |  SELECT query_id, cand, count(*) AS votes
         |  FROM nb WHERE rank <= 5 GROUP BY 1, 2),
         |p AS (
         |  SELECT query_id, cand, votes,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY votes DESC, cand) AS rn
         |  FROM v)
         |SELECT p.query_id, q.label_actual, p.cand AS label_predicted,
         |  p.votes
         |FROM p JOIN q ON q.query_id = p.query_id
         |WHERE p.rn = 1 ORDER BY p.query_id""".stripMargin),

    // k-NN classification, scale form: neighbours served from the IVF
    // coarse quantizer (nProbe posting lists per query) instead of a
    // corpus scan, then the SAME integer vote. Invariant row: coverage +
    // prediction agreement with the exact classifier ≥ 0.6 (measured at
    // nProbe=20: 0.80 at sf0.01, 0.825 at sf0.1). Honest regime note, as
    // on the sibling ANN rows: these mid-cosine embeddings fragment the
    // 10-label vote, so agreement tracks neighbour recall and needs a
    // high probe count; in the high-cosine regimes ANN serves in
    // production, vote margins absorb recall loss at far smaller nProbe.
    "knn_classify_ivf" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") % 50 === 0)
        val exact = Similarity.knnClassify(queries, emb, k = 5)
        val approx = Similarity.buildIvfIndex(emb, nCentroids = 32,
          refineIters = 2) match {
          case None => exact.limit(0)
          case Some(idx) =>
            Similarity.knnClassifyIvf(queries, emb, idx, k = 5, nProbe = 20)
        }
        val agree = approx.select(col("query_id"),
          col("label_predicted").as("lp_approx"))
          .join(exact.select(col("query_id"),
            col("label_predicted").as("lp_exact")), "query_id")
          // coalesce: an empty join (no IVF index / zero coverage) must
          // fail DEFINITELY (false), not as a three-valued NULL boolean
          .agg(count(lit(1)).as("n_covered"),
            coalesce(sum(when(col("lp_approx") === col("lp_exact"), 1L)
              .otherwise(0L)), lit(0L)).as("n_agree"))
        queries.agg(count(lit(1)).as("n_queries")).crossJoin(agree)
          .select(col("n_queries").cast("long"),
            (col("n_covered") === col("n_queries")).as("coverage_ok"),
            (col("n_agree") >= col("n_covered") * 0.6).as("agree_ok"))
      },
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, TRUE AS coverage_ok,
        |  TRUE AS agree_ok
        |FROM embeddings WHERE vec_id % 50 = 0""".stripMargin),

    // BPE tokenizer-training step: the top-20 first-round merge
    // candidates — adjacent character pairs weighted by word frequency,
    // ranked (count DESC, a, b). Pure integer counts; the oracle
    // re-derives the vocab collapse + pair explosion with substr over
    // generate_series. Scale: the explosion runs over the distinct-word
    // VOCAB, so a full merge loop on top costs per-round
    // vocabulary-sized work, not corpus-sized.
    "ext_bpe_merges" -> QueryDef(
      (s, dir) => TextAnalysis.bpePairCounts(Tables.documents(s, dir),
        topK = 20),
      """WITH vocab AS (
        |  SELECT w, count(*) AS n FROM (
        |    SELECT unnest(string_split(coalesce(text, ''), ' ')) AS w
        |    FROM documents)
        |  WHERE len(w) > 0 GROUP BY w),
        |pairs AS (
        |  SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b, n
        |  FROM vocab, unnest(generate_series(1, len(w) - 1)) AS t(i)
        |  WHERE len(w) >= 2),
        |agg AS (
        |  SELECT a, b, CAST(sum(n) AS BIGINT) AS cnt FROM pairs GROUP BY a, b)
        |SELECT a, b, cnt,
        |  CAST(row_number() OVER (ORDER BY cnt DESC, a, b) AS BIGINT) AS rank
        |FROM agg
        |QUALIFY rank <= 20""".stripMargin),

    // BPE train→ENCODE end-to-end (TextAnalysis.bpeTrain + bpeEncode):
    // train 12 merges on the corpus, encode the same corpus with them,
    // and grade the serve path in-plan — (a) every distinct word's
    // encoding equals the trained vocab's final segmentation (encoding
    // replays training by construction, this pins it over real data),
    // (b) concatenating each doc's tokens reproduces its space-stripped
    // text (no symbol lost or invented), (c) every multi-char token is a
    // trained merge output (closure). Merge tables and token arrays are
    // data-derived — no portable SQL replays a greedy BPE — so the row
    // follows the invariant-oracle convention; n_docs and n_words are
    // re-derived independently by DuckDB.
    "ext_bpe_encode" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val (trained, vocabDf) = TextAnalysis.bpeTrain(docs, nMerges = 12)
        val merges = trained.map(m => (m._1, m._2))
        val enc = TextAnalysis.bpeEncode(docs, merges)
          .localCheckpoint(eager = false)
        val allowed = array(merges.map { case (a, b) => lit(a + b) }: _*)
        val words = docs.select(
            explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
          .filter(length(col("w")) > 0).distinct()
        val vocabMatch = TextAnalysis.bpeEncodeWords(words, merges)
          .join(vocabDf.select(concat_ws("", col("syms")).as("w"),
            col("syms").as("trained_syms")), "w")
          .agg(count(lit(1)).as("n_words"),
            every(col("syms") === col("trained_syms")).as("vocab_match_ok"))
        val docChecks = enc
          .join(docs.select(col("doc_id"), col("text")), "doc_id")
          .agg(
            count(lit(1)).as("n_docs"),
            every(concat_ws("", col("tokens")) ===
              regexp_replace(coalesce(col("text"), lit("")), " ", ""))
              .as("recon_ok"),
            every(forall(col("tokens"),
              t => length(t) === 1 || array_contains(allowed, t)))
              .as("closure_ok"))
        docChecks.crossJoin(vocabMatch)
          .select(col("n_docs"), col("n_words"), col("vocab_match_ok"),
            col("recon_ok"), col("closure_ok"))
      },
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
        |  (SELECT CAST(count(DISTINCT w) AS BIGINT) FROM (
        |     SELECT unnest(string_split(coalesce(text, ''), ' ')) AS w
        |     FROM documents) WHERE len(w) > 0) AS n_words,
        |  TRUE AS vocab_match_ok, TRUE AS recon_ok,
        |  TRUE AS closure_ok""".stripMargin),

    // ANALYZE-style table profile over events (value snapped to cents —
    // raw double min/max stringify engine-specifically): per-column
    // rows/nulls/exact-ndv/min/max, one pruned single-column pass per
    // column (never N count_distincts in one plan — the a13 Expand trap).
    "ext_table_profile" -> QueryDef(
      (s, dir) => Profiling.columnProfile(
        Tables.events(s, dir).select(
          col("event_id"), col("user_id"), col("event_type"), col("props"),
          expr("CAST(round(value * 100) AS BIGINT)").as("value_cents")),
        Seq("event_id", "user_id", "event_type", "props", "value_cents")),
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, props,
        |    CAST(round(value * 100) AS BIGINT) AS value_cents
        |  FROM events)
        |SELECT 'event_id' AS "column", count(*) AS n_rows,
        |  count(*) - count(event_id) AS n_nulls,
        |  count(DISTINCT event_id) AS n_distinct,
        |  CAST(min(event_id) AS VARCHAR) AS min_str,
        |  CAST(max(event_id) AS VARCHAR) AS max_str FROM e
        |UNION ALL
        |SELECT 'user_id', count(*), count(*) - count(user_id),
        |  count(DISTINCT user_id), CAST(min(user_id) AS VARCHAR),
        |  CAST(max(user_id) AS VARCHAR) FROM e
        |UNION ALL
        |SELECT 'event_type', count(*), count(*) - count(event_type),
        |  count(DISTINCT event_type), min(event_type), max(event_type) FROM e
        |UNION ALL
        |SELECT 'props', count(*), count(*) - count(props),
        |  count(DISTINCT props), min(props), max(props) FROM e
        |UNION ALL
        |SELECT 'value_cents', count(*), count(*) - count(value_cents),
        |  count(DISTINCT value_cents), CAST(min(value_cents) AS VARCHAR),
        |  CAST(max(value_cents) AS VARCHAR) FROM e""".stripMargin),

    // Curriculum schedule: rank by lexical richness, cut into 10 strata,
    // interleave round-robin (best stratum first per round) — the exact
    // reproducible training order. Runs on the distributed range-indexed
    // path (no single-partition window); the oracle re-derives both
    // orders with plain windows + the same floor arithmetic.
    "ext_curriculum" -> QueryDef(
      (s, dir) => TextAnalysis.curriculumOrder(
        Tables.documents(s, dir).select(col("doc_id"),
          size(array_distinct(split(coalesce(col("text"), lit("")), " ")))
            .cast("long").as("score")),
        score = col("score"), id = "doc_id", buckets = 10),
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(len(list_distinct(string_split(coalesce(text, ''), ' ')))
        |      AS BIGINT) AS score
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, score,
        |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rn,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM s),
        |b AS (
        |  SELECT doc_id, score, ((rn - 1) * 10) // n AS bucket,
        |    (rn - 1) - ((((rn - 1) * 10 // n) * n + 9) // 10) AS rib
        |  FROM r)
        |SELECT doc_id, score, CAST(bucket AS BIGINT) AS bucket,
        |  CAST(row_number() OVER (ORDER BY rib, bucket) AS BIGINT) AS position
        |FROM b""".stripMargin),

    // Corpus term statistics + per-doc top terms — the TF-IDF shape
    // (explode → per-(doc, term) TF agg → per-term DF agg → join back →
    // per-doc top-k window). Ranking is (tf DESC, df ASC, token) — the
    // tf-idf ORDER with the log() left out, because ln(x) is the one step
    // two engines can disagree on in the last ulp; the integer ordering
    // is bit-stable and semantically identical for ranking. Scale shape:
    // two shuffles (doc-term, term), DF side is corpus-vocabulary-sized
    // so it carries no broadcast hint (AQE decides), top-k is one window
    // over the doc key.
    "ext_top_terms" -> QueryDef(
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        val tf = toks.groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("tf").desc, col("df").asc, col("token"))
        tf.join(df, "token")
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("doc_id"), col("rnk").cast("long").as("rnk"),
            col("token"), col("tf"), col("df"))
      },
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |r AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf DESC, df.df ASC, tf.token) AS rnk
        |  FROM tf JOIN df USING (token))
        |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, token, tf, df
        |FROM r WHERE rnk <= 3""".stripMargin),

    // IVF with a PERSISTED index — the FAISS build-once/search-many split
    // as data-visible behavior: the coarse quantizer (centroids + posting
    // lists, both plain columnar frames) is written to parquet, read
    // back, and served from — the corpus is never re-clustered at query
    // time, which is the entire point of an IVF index at 100 TB. Same
    // invariants and recall floor as ann_ivf_topk: a lossy or mis-keyed
    // round-trip would tank recall below the 0.6 floor.
    "ann_ivf_persisted" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") % 50 === 0)
        // graceful empty-corpus branch, mirroring ivfTopK's None path (a
        // bare .get would crash where every sibling ANN query degrades)
        val approx = Similarity.buildIvfIndex(emb, nCentroids = 32,
          refineIters = 2) match {
          case None => s.range(0).select(col("id").as("query_id"),
            col("id").as("rank"), col("id").as("neighbor_id"))
          case Some(idx) =>
            val root = scratch("ivf_idx")
            // the write materializes the centroids' lazy checkpoint; its
            // blocks stay resident afterwards — bounded and tiny (K rows
            // of K-dim vectors, ~KBs), so not worth plumbing an unpersist
            idx.centroids.write.mode("overwrite").parquet(s"$root/centroids")
            idx.postings.write.mode("overwrite").parquet(s"$root/postings")
            val reloaded = Similarity.IvfIndex(
              s.read.parquet(s"$root/centroids"),
              s.read.parquet(s"$root/postings"))
            Similarity.ivfTopKWithIndex(queries, emb, reloaded, k = 5,
              nProbe = 12)
        }
        annInvariants(queries, approx,
          Similarity.bruteForceTopK(queries, emb, k = 5),
          k = 5, recallFloor = 0.6)
      },
      annInvariantOracle),

    // Incremental index growth (round 11) — the FAISS add() lifecycle as
    // data-visible behavior: the coarse quantizer is trained on 80% of
    // the corpus, the remaining 20% is APPENDED (assigned to the frozen
    // centroids, postings unioned — no re-clustering), and queries are
    // served against the full union. Recall is floor-checked against
    // brute force on the union, so a broken append (dropped batch,
    // re-keyed postings, drifted assignment) tanks below 0.6. The
    // append ≡ assign-on-union posting identity is spec-pinned bit-exact
    // (SimilaritySpec).
    "ann_ivf_appended" -> QueryDef(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val base = emb.filter(col("vec_id") % 5 =!= 0)
        val batch = emb.filter(col("vec_id") % 5 === 0)
        val queries = emb.filter(col("vec_id") % 50 === 0)
        val approx = Similarity.buildIvfIndex(base, nCentroids = 32,
          refineIters = 2) match {
          case None => s.range(0).select(col("id").as("query_id"),
            col("id").as("rank"), col("id").as("neighbor_id"))
          case Some(idx) =>
            Similarity.ivfTopKWithIndex(queries, emb,
              Similarity.ivfAppend(idx, batch), k = 5, nProbe = 12)
        }
        annInvariants(queries, approx,
          Similarity.bruteForceTopK(queries, emb, k = 5),
          k = 5, recallFloor = 0.6)
      },
      annInvariantOracle),

    // Text statistics: lengths, token counts, type/token ratio, stopword
    // ratio, subword estimate, punctuation ratio.
    "ext_text_stats" -> QueryDef(
      (s, dir) => TextAnalysis.textStats(Tables.documents(s, dir))
        .withColumn("n_chars", col("n_chars").cast("long"))
        .withColumn("n_tokens", col("n_tokens").cast("long"))
        .withColumn("n_uniq_tokens", col("n_uniq_tokens").cast("long")),
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_tokens,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text, ' '),
        |      t -> CAST(ceil(length(t) / 4.0) AS BIGINT))),
        |    (a, b) -> a + b) AS n_subword_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / nullif(len(string_split(text, ' ')), 0) AS type_token_ratio,
        |  CAST(len(list_filter(string_split(text, ' '),
        |         t -> list_contains(['the','a','of','in','to','and','is'], t)))
        |       AS DOUBLE) / nullif(len(string_split(text, ' ')), 0) AS stopword_ratio,
        |  CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
        |    / nullif(length(text), 0) AS punct_ratio
        |FROM documents""".stripMargin),

    // Quality scoring over the stats (reference-free corpus filter shape).
    "ext_quality_score" -> QueryDef(
      (s, dir) => TextAnalysis.qualityScore(
        TextAnalysis.textStats(Tables.documents(s, dir)))
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("quality_score")),
      s"""WITH $duckQualityCte
         |SELECT doc_id, n_tokens, quality_score FROM q""".stripMargin),

    // Quantile-gated quality filter (exact form): within each language,
    // drop the least lexically-diverse quarter by rank over the integer
    // parts-per-billion diversity score — no float thresholds anywhere.
    // The approx_percentile scale path is pinned against this row by
    // DiversityGateSpec (≥95% survivor agreement).
    "ext_diversity_gate" -> QueryDef(
      (s, dir) => TextAnalysis.diversityGateExact(
        Tables.documents(s, dir), 0.25, "lang").orderBy("grp", "doc_id"),
      """WITH st AS (
        |  SELECT lang AS grp, doc_id,
        |    CAST(len(list_distinct(string_split(coalesce(text, ''), ' ')))
        |         AS BIGINT) * 1000000000
        |      // CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT)
        |      AS ttr_ppb
        |  FROM documents),
        |r AS (
        |  SELECT grp, doc_id, ttr_ppb,
        |    row_number() OVER (PARTITION BY grp ORDER BY ttr_ppb, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY grp) AS n
        |  FROM st)
        |SELECT grp, doc_id, ttr_ppb FROM r
        |WHERE rn > floor(n * 0.25)
        |ORDER BY grp, doc_id""".stripMargin),

    // Language-ID heuristic: marker-token hits per language, argmax with
    // ties to the lexicographically greatest code, no hits → 'und'.
    "ext_lang_id" -> QueryDef(
      (s, dir) => TextAnalysis.langId(Tables.documents(s, dir))
        .withColumn("marker_hits", col("marker_hits").cast("long")),
      s"""WITH $duckLangCte
         |SELECT doc_id, lang_actual, lang_predicted, marker_hits FROM lp""".stripMargin),

    // The composite curation flow an LLM-data pipeline actually runs —
    // quality gate → language gate → exact dedup → near-dup removal — as
    // ONE registered query, so the operator COMPOSITION is oracle-checked,
    // not just each stage. Spark runs the scale-shaped plan (scan-speed
    // native text passes; 16-byte exact-dedup keys; MinHash-LSH banding
    // with exact verify for near-dups); the oracle independently re-derives
    // the survivor set with brute-force exact Jaccard. Near-dup policy is
    // greedy keep-smallest: drop every doc_b of a verified pair (doc_a <
    // doc_b), deterministic in both engines.
    "ext_corpus_curation" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val scored = TextAnalysis.qualityScore(TextAnalysis.textStats(docs))
          .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
            col("quality_score"))
        val lang = TextAnalysis.langId(docs)
          .select(col("doc_id"), col("lang_predicted"))
        val filtered = docs.select(col("doc_id"), col("text"))
          .join(scored.filter(col("quality_score") > 0.5), "doc_id")
          .join(lang.filter(col("lang_predicted") === "en"), "doc_id")
        val canon = filtered
          .groupBy(xxhash64(col("text")), length(col("text")))
          .agg(min(col("doc_id")).as("doc_id"))
          .select("doc_id")
        // LAZY checkpoint (Dedup convention): exactKept feeds the LSH
        // pair generator AND the final anti-join left side — without
        // persistence the quality+lang scoring and both joins re-run per
        // branch, roughly doubling the expensive text passes.
        val exactKept = filtered.join(canon, Seq("doc_id"), "left_semi")
          .localCheckpoint(eager = false)
        // maxBucket=512 (round 10): the sf1 cost-curve measured band
        // buckets growing LINEARLY with corpus size on this short-doc
        // distribution (popular shingles win min-hashes; 18 docs/bucket
        // at sf0.1 → 6,175 at 10× → 36.5M candidate pairs in the tail),
        // which makes uncapped pair generation quadratic. The cap is a
        // NO-OP at every driver SF (largest sf0.1 bucket: 18 — oracle
        // unchanged) and at scale skips only template-cohort buckets, a
        // bounded, documented recall trade (Dedup.minhashLshPairs
        // scaladoc; BENCH_SF1.md shows it restoring ~linear cost).
        val nearDupLosers = Dedup.minhashLshPairs(exactKept, n = 3,
          numPerm = 32, rowsPerBand = 2, num = 1, den = 2, maxBucket = 512)
          .select(col("doc_b").as("doc_id")).distinct()
        exactKept.join(nearDupLosers, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("lang_predicted"), col("n_tokens"),
            col("quality_score"))
      },
      s"""WITH $duckQualityCte,
         |$duckLangCte,
         |filt AS (
         |  SELECT d.doc_id, d.text, lp.lang_predicted, q.n_tokens, q.quality_score
         |  FROM documents d
         |  JOIN q USING (doc_id) JOIN lp USING (doc_id)
         |  WHERE q.quality_score > 0.5 AND lp.lang_predicted = 'en'),
         |canon AS (SELECT min(doc_id) AS doc_id FROM filt GROUP BY text),
         |ek AS (SELECT f.* FROM filt f JOIN canon USING (doc_id)),
         |ew AS (SELECT doc_id, string_split(text, ' ') AS ws FROM ek),
         |esh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(ws) < 3 THEN []
         |         ELSE list_distinct(list_transform(generate_series(1, len(ws) - 2),
         |                i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))
         |    END AS sh
         |  FROM ew),
         |losers AS (
         |  SELECT DISTINCT b.doc_id
         |  FROM esh a, esh b
         |  WHERE a.doc_id < b.doc_id
         |    AND len(a.sh) + len(b.sh) > 0
         |    AND 2 * len(list_intersect(a.sh, b.sh)) >=
         |        len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
         |SELECT doc_id, lang_predicted, n_tokens, quality_score FROM ek
         |WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin),

    // TRAINED quality classifier for curation — the fastText-style gate
    // real LLM pipelines run (train a cheap classifier on a labeled seed
    // set, gate the whole corpus with the served model), composed from
    // two green components: Features.logisticFit (distributed IRLS,
    // ridge-regularized) over TextAnalysis.hashedBowWide features. The
    // seed set is a deterministic 50% md5 doc_id sample ("the annotated
    // subset"); the label is the deterministic heuristic rule nt >= 55
    // (raw split token count). Features are b0..b14 + z(nt): b15 is
    // deliberately dropped — nt is the sum of ALL 16 buckets, so a full
    // bucket basis plus nt would be perfectly collinear; the ridge
    // (0.03) additionally keeps the fit well-posed when a bucket is
    // empty on a given corpus (zero-variance column) and keeps the
    // separable-direction coefficients finite so served probabilities
    // stay strictly inside (0, 1).
    // Oracle split (the a23 contract): integer-deterministic columns —
    // n_fit, n_total, and the heuristic-rule count n_rule — are
    // re-derived EXACTLY by DuckDB (md5 sample + tokenization + rule);
    // float-dependent MODEL facts ride as in-plan booleans SQL can't
    // reach: the learned gate agrees with its training heuristic on
    // ≥ 95% of the corpus and within ±5% on gate volume (a trained
    // approximation, not a copy — boundary docs may legitimately flip),
    // probabilities strictly inside (0,1), fit deviance below the null
    // model's (the MLE-improvement invariant), artifact persist+reload
    // identity, and fit-size consistency.
    // Scale: featurize is one explode + one map-side-combined doc_id
    // aggregation; each IRLS iteration is ONE p²-bounded moment pass;
    // serve is map-only literals — corpus-size-independent model state.
    "ext_quality_model" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val nBuckets = 16
        val wide = TextAnalysis.hashedBowWide(docs, nBuckets,
          seed = "r9q", algo = "md5")
        val ntC = (0 until nBuckets).map(i => col(s"b$i")).reduce(_ + _)
          .cast("double")
        // LAZY checkpoint: the featurized frame feeds the fit-set stats,
        // the IRLS source, and the full-corpus serve
        val w = wide.withColumn("nt", ntC)
          .withColumn("seedset",
            Sampling.bucket(col("doc_id"), "r9qs", "md5") < lit(500000L))
          .localCheckpoint(eager = false)
        val fitSet = w.filter(col("seedset"))
        val st = fitSet.agg(avg(col("nt")).as("m"),
          stddev_pop(col("nt")).as("sd")).head()
        val (mean, sd) = (st.getDouble(0), st.getDouble(1))
        val feats = ((col("nt") - lit(mean)) / lit(sd)) +:
          (0 until nBuckets - 1).map(i => col(s"b$i").cast("double"))
        val rule = col("nt") >= lit(55.0)
        val fit = Features.logisticFit(fitSet, feats, rule,
          maxIters = 25, ridge = 0.03).get
        val rtDir = scratch("quality-model")
        Features.logisticModelToFrame(s, fit).write.parquet(rtDir)
        val model = Features.logisticModelFromFrame(s.read.parquet(rtDir))
        val rtOk = model.coef.sameElements(fit.coef) &&
          model.nFit == fit.nFit && model.gradNorm == fit.gradNorm
        val ybar = fitSet.agg(avg(rule.cast("int").cast("double")))
          .head().getDouble(0)
        val served = Features.logisticPredict(w, model, feats)
          .withColumn("gated", col("probability") >= 0.5)
          .withColumn("yy", rule.cast("int").cast("double"))
        def dev(prob: org.apache.spark.sql.Column) =
          lit(-2.0) * sum(when(col("seedset"),
            col("yy") * log(prob) +
              (lit(1.0) - col("yy")) * log(lit(1.0) - prob)).otherwise(0.0))
        served.agg(
            sum(col("seedset").cast("long")).as("n_fit"),
            count(lit(1)).as("n_total"),
            sum(rule.cast("long")).as("n_rule"),
            sum(col("gated").cast("long")).as("n_gated"),
            sum((col("gated") === rule).cast("long")).as("n_agree"),
            every(col("probability") > 0.0 && col("probability") < 1.0)
              .as("probs_ok"),
            dev(col("probability")).as("dev_fit"),
            dev(lit(ybar)).as("dev_null"))
          .select(
            col("n_fit"), col("n_total"), col("n_rule"),
            (col("n_agree") * lit(100L) >= col("n_total") * lit(95L))
              .as("gate_agrees"),
            (abs(col("n_gated") - col("n_rule")) * lit(100L) <=
              col("n_total") * lit(5L)).as("gate_volume_ok"),
            col("probs_ok"),
            (col("dev_fit") <= col("dev_null") + lit(1e-6)).as("beats_null"),
            lit(rtOk).as("roundtrip_ok"),
            (col("n_fit") === lit(fit.nFit)).as("nfit_consistent"))
      },
      s"""WITH t AS (
         |  SELECT doc_id,
         |    len(string_split(coalesce(text, ''), ' ')) AS nt,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':r9qs'), 1, 15))
         |      AS BIGINT) % 1000000 AS bkt
         |  FROM documents)
         |SELECT
         |  CAST(sum(CASE WHEN bkt < 500000 THEN 1 ELSE 0 END) AS BIGINT) AS n_fit,
         |  CAST(count(*) AS BIGINT) AS n_total,
         |  CAST(sum(CASE WHEN nt >= 55 THEN 1 ELSE 0 END) AS BIGINT) AS n_rule,
         |  TRUE AS gate_agrees, TRUE AS gate_volume_ok, TRUE AS probs_ok,
         |  TRUE AS beats_null, TRUE AS roundtrip_ok, TRUE AS nfit_consistent
         |FROM t""".stripMargin),

    // Token counting (north star: whitespace + a BPE-ish regex): the
    // GPT-2-style pre-tokenizer shape — contraction suffixes, space-glued
    // letter runs, digit runs, punctuation runs, residual whitespace —
    // restricted to lookahead-free constructs so Java regex (Spark) and
    // RE2 (DuckDB) agree; both engines use leftmost-first alternation.
    // subword_est is the cheap ceil(len/4) estimate from ext_text_stats —
    // emitted here so the two costings are comparable side by side.
    "ext_token_count" -> QueryDef(
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+|\\s"),
          lit(0))).cast("long").as("n_bpe_tokens"),
        expr("CAST(aggregate(transform(split(text, ' '), " +
          "t -> CAST(ceil(length(t) / 4.0) AS BIGINT)), 0L, (a, b) -> a + b) AS BIGINT)")
          .as("subword_est")),
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text,
        |    '''(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s'']+|\s'))
        |    AS BIGINT) AS n_bpe_tokens,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text, ' '),
        |      t -> CAST(ceil(length(t) / 4.0) AS BIGINT))),
        |    (a, b) -> a + b) AS subword_est
        |FROM documents""".stripMargin),

    // RAG chunking with overlap (TextAnalysis.chunkWithOverlap): 120-char
    // chunks every 90 chars (30 overlap), 1-based offsets kept. Pure
    // integer arithmetic + substring — both engines derive the identical
    // chunk boundaries and bodies; the map-only explode is the plan.
    "ext_chunk_overlap" -> QueryDef(
      (s, dir) => TextAnalysis.chunkWithOverlap(
        Tables.documents(s, dir), chunkSize = 120, overlap = 30),
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS len FROM documents),
        |e AS (
        |  SELECT doc_id, text, len,
        |    unnest(generate_series(0, greatest(0, (len - 120 + 89) // 90))) AS i
        |  FROM d)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |  CAST(i * 90 + 1 AS BIGINT) AS start,
        |  CAST(least(i * 90 + 120, len) AS BIGINT) AS "end",
        |  substr(text, CAST(i * 90 + 1 AS INT), 120) AS chunk
        |FROM e""".stripMargin),

    // KenLM-lite quality signal (TextAnalysis.bigramCoverage): fraction of
    // each doc's word bigrams present in the corpus's top-200 bigram
    // vocabulary — the integer-exact stand-in for reference-LM perplexity
    // filtering (CCNet). The vocab rank order (count desc, bigram asc) is
    // total, so both engines elect the identical 200; counts are exact
    // integers and the one double division is IEEE-identical.
    "ext_bigram_coverage" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        TextAnalysis.bigramCoverage(docs,
          TextAnalysis.bigramVocab(docs, topK = 200))
      },
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |    unnest(CASE WHEN len(ws) < 2 THEN []
        |      ELSE list_transform(generate_series(1, len(ws) - 1),
        |             i -> ws[i] || ' ' || ws[i+1]) END) AS bigram
        |  FROM w),
        |vocab AS (
        |  SELECT bigram FROM (
        |    SELECT bigram, count(*) AS n FROM bg GROUP BY bigram)
        |  QUALIFY row_number() OVER (ORDER BY n DESC, bigram) <= 200),
        |sc AS (
        |  SELECT b.doc_id, count(*) AS n_bigrams,
        |    count(v.bigram) AS n_hits
        |  FROM bg b LEFT JOIN vocab v USING (bigram)
        |  GROUP BY b.doc_id)
        |SELECT d.doc_id,
        |  coalesce(sc.n_bigrams, 0) AS n_bigrams,
        |  coalesce(sc.n_hits, 0) AS n_hits,
        |  CASE WHEN coalesce(sc.n_bigrams, 0) = 0 THEN 0.0
        |       ELSE CAST(sc.n_hits AS DOUBLE) / CAST(sc.n_bigrams AS DOUBLE)
        |  END AS coverage
        |FROM (SELECT doc_id FROM documents) d
        |LEFT JOIN sc USING (doc_id)""".stripMargin),

    // CCNet reference-LM perplexity filter (round 11) — train an add-1
    // bigram LM on a hash-gated reference split (md5 differential path),
    // score every document by exact BIGINT micro-nat surprisal (the
    // quantized ln chain documented at TextAnalysis.lmScore — the
    // mantissa log table is interpolated into this oracle from the SAME
    // Scala constant, the PoissonCdfMicro convention), then cut exact
    // head/middle/tail tertiles by (avg_surprisal, doc_id) rank. The one
    // double compared (avg_surprisal_micro) is a single IEEE division of
    // identical integers in both engines.
    "ext_lm_perplexity" -> QueryDef(
      (s, dir) => TextAnalysis.lmPerplexity(Tables.documents(s, dir),
        vocabK = 150, lmK = 500, refFraction = 0.3, seed = "r11lm",
        algo = "md5"),
      lmPerplexityOracle(vocabK = 150, lmK = 500, refFraction = 0.3,
        seed = "r11lm")),

    // The SERVE/STREAM shape of the same filter, held to the SAME
    // DuckDB oracle: lmScoreRowwise pre-evaluates every reachable
    // quantized cost driver-side and scores each document in one
    // stateless projection (no explode, no join, no shuffle) — so three
    // independent computations (Spark explode+broadcast-join, Spark
    // in-row fold over precomputed tables, DuckDB SQL) must land on
    // bit-identical BIGINT sums. This row is what certifies the
    // streaming perplexityGate's scoring path.
    "ext_lm_perplexity_rowwise" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val ref = graft.operators.Sampling.sample(docs, col("doc_id"),
          0.3, "r11lm", "md5")
        TextAnalysis.lmPerplexityBuckets(TextAnalysis.lmScoreRowwise(
          docs, TextAnalysis.lmTrain(ref, vocabK = 150, lmK = 500)))
      },
      lmPerplexityOracle(vocabK = 150, lmK = 500, refFraction = 0.3,
        seed = "r11lm")),

    // PMI collocations (round 9) — statistical phrase detection over
    // adjacent token pairs: the exported `score` is the ratio inside the
    // PMI ln (monotone — same ranking/gating, no transcendental), the
    // is_colloc gate (score ≥ 1.2) is decided by DECIMAL/HUGEINT integer
    // cross-multiplication, and the score itself is one fixed
    // left-associated IEEE chain. 153 of 900 pairs gate true at sf0.01 —
    // both classes realized in data.
    "ext_collocations" -> QueryDef(
      (s, dir) => TextAnalysis.collocations(Tables.documents(s, dir),
        minPairCount = 5L, thresholdMilli = 1200L),
      """WITH w AS (
        |  SELECT string_split(text, ' ') AS ws FROM documents
        |  WHERE text IS NOT NULL),
        |u AS (SELECT unnest(ws) AS t FROM w),
        |uc AS (SELECT t, count(*) AS n_w FROM u GROUP BY 1),
        |nu AS (SELECT count(*) AS n_tokens FROM u),
        |bg AS (
        |  SELECT unnest(CASE WHEN len(ws) < 2 THEN []
        |    ELSE list_transform(generate_series(1, len(ws) - 1),
        |           i -> ws[i] || ' ' || ws[i+1]) END) AS b
        |  FROM w),
        |nb AS (SELECT count(*) AS n_bigrams FROM bg),
        |pc AS (
        |  SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2,
        |    count(*) AS n_pair
        |  FROM bg GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT pc.w1, pc.w2, pc.n_pair, c1.n_w AS n_w1, c2.n_w AS n_w2,
        |  (SELECT n_tokens FROM nu) AS n_tokens,
        |  (SELECT n_bigrams FROM nb) AS n_bigrams,
        |  CAST(pc.n_pair AS DOUBLE)
        |    * CAST((SELECT n_tokens FROM nu) AS DOUBLE)
        |    * CAST((SELECT n_tokens FROM nu) AS DOUBLE)
        |    / (CAST((SELECT n_bigrams FROM nb) AS DOUBLE)
        |       * CAST(c1.n_w AS DOUBLE) * CAST(c2.n_w AS DOUBLE)) AS score,
        |  CAST(1000 AS HUGEINT) * pc.n_pair
        |    * (SELECT n_tokens FROM nu) * (SELECT n_tokens FROM nu)
        |    >= CAST(1200 AS HUGEINT) * (SELECT n_bigrams FROM nb)
        |       * c1.n_w * c2.n_w AS is_colloc
        |FROM pc
        |JOIN uc c1 ON c1.t = pc.w1
        |JOIN uc c2 ON c2.t = pc.w2""".stripMargin),

    // Content fingerprints: MD5 of the normalized text + 31-base rolling
    // hash over tokens mod 1e9+7.
    "ext_fingerprint" -> QueryDef(
      (s, dir) => TextAnalysis.fingerprints(Tables.documents(s, dir)),
      """WITH n AS (
        |  SELECT doc_id,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS content_md5,
        |  list_reduce(list_prepend(CAST(7 AS BIGINT),
        |    list_transform(string_split(norm, ' '),
        |      t -> CAST(length(t) * 131 + ascii(substr(t, 1, 1)) AS BIGINT))),
        |    (a, x) -> (a * 31 + x) % 1000000007) AS rolling_hash
        |FROM n""".stripMargin),

    // Test-set decontamination (md5 gram hash, word 5-grams): benchmark =
    // every 29th doc, corpus = the rest; a corpus doc is contaminated when
    // ANY distinct 5-gram also appears in the benchmark. The operator
    // intersects HASHED gram sets (broadcast sorted-array + native
    // two-pointer count, corpus side map-only), so the oracle re-derives
    // the SAME md5-derived 60-bit hashes and joins exploded grams — two
    // independent algorithms over identical hash values.
    "ext_decontaminate" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Decontamination.flag(
          corpus = docs.where(col("doc_id") % 29 =!= 0),
          benchmark = docs.where(col("doc_id") % 29 === 0),
          n = 5, minShared = 1, algo = "md5")
      },
      """WITH w AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ws) < 5 THEN []
        |         ELSE list_distinct(list_transform(generate_series(1, len(ws) - 4),
        |                i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3], ws[i+4])))
        |    END AS sh
        |  FROM w),
        |hs AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(sh,
        |      g -> CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT))) AS hv
        |  FROM s),
        |bench AS (SELECT DISTINCT unnest(hv) AS h FROM hs WHERE doc_id % 29 = 0),
        |corpus AS (SELECT doc_id, hv FROM hs WHERE doc_id % 29 <> 0),
        |hits AS (
        |  SELECT cg.doc_id, count(*) AS n_shared
        |  FROM (SELECT doc_id, unnest(hv) AS h FROM corpus) cg
        |  JOIN bench USING (h) GROUP BY cg.doc_id)
        |SELECT c.doc_id, CAST(len(c.hv) AS BIGINT) AS n_grams,
        |  CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared,
        |  coalesce(h.n_shared, 0) >= 1 AS contaminated
        |FROM corpus c LEFT JOIN hits h USING (doc_id)""".stripMargin),

    // Decontamination PRODUCTION path (xxh64 gram hash): same corpus
    // split, and the invariant the oracle asserts is hash-independence —
    // both hash parameterizations intersect the SAME string gram sets, so
    // flags and shared-counts must agree document-for-document (divergence
    // would need a gram-hash collision, rate 2^-60).
    "ext_decontaminate_prod" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        def run(algo: String) = Decontamination.flag(
          corpus = docs.where(col("doc_id") % 29 =!= 0),
          benchmark = docs.where(col("doc_id") % 29 === 0),
          n = 5, minShared = 1, algo = algo)
        run("xxh64").alias("x")
          .join(run("md5").alias("m"), "doc_id")
          .agg(
            count(lit(1)).cast("long").as("n_docs"),
            sum(when(col("x.contaminated"), 1L).otherwise(0L)).as("n_contaminated"),
            every(col("x.n_shared") === col("m.n_shared")).as("counts_agree"),
            every(col("x.contaminated") === col("m.contaminated")).as("flags_agree"))
      },
      """WITH w AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ws) < 5 THEN []
        |         ELSE list_distinct(list_transform(generate_series(1, len(ws) - 4),
        |                i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3], ws[i+4])))
        |    END AS sh
        |  FROM w),
        |bench AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % 29 = 0),
        |corpus AS (SELECT doc_id, sh FROM s WHERE doc_id % 29 <> 0),
        |hits AS (
        |  SELECT cg.doc_id, count(*) AS n_shared
        |  FROM (SELECT doc_id, unnest(sh) AS g FROM corpus) cg
        |  JOIN bench USING (g) GROUP BY cg.doc_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) FILTER (WHERE coalesce(h.n_shared, 0) >= 1) AS BIGINT)
        |    AS n_contaminated,
        |  TRUE AS counts_agree, TRUE AS flags_agree
        |FROM corpus c LEFT JOIN hits h USING (doc_id)""".stripMargin),

    // Within-document repetition (Gopher-style duplicate-n-gram fraction,
    // word 2-grams, gate at > 1/10): integer-exact gate, one double
    // division rounded to 6 for the fraction itself.
    "ext_repetition" -> QueryDef(
      (s, dir) => TextAnalysis.repetition(Tables.documents(s, dir), n = 2),
      """WITH w AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CAST(greatest(len(ws) - 1, 0) AS INT) AS n_grams_total,
        |    CAST(CASE WHEN len(ws) < 2 THEN 0
        |         ELSE len(list_distinct(list_transform(
        |                generate_series(1, len(ws) - 1),
        |                i -> concat_ws(' ', ws[i], ws[i+1]))))
        |    END AS INT) AS n_grams_distinct
        |  FROM w)
        |SELECT doc_id, n_grams_total, n_grams_distinct,
        |  CASE WHEN n_grams_total > 0
        |       THEN round(CAST(1 AS DOUBLE)
        |              - CAST(n_grams_distinct AS DOUBLE) / n_grams_total, 6)
        |       ELSE CAST(0 AS DOUBLE) END AS dup_frac,
        |  (n_grams_total - n_grams_distinct) * 10 > n_grams_total * 1
        |    AS repetitive
        |FROM g""".stripMargin),

    // PII scan + redaction. The corpus itself carries no PII, so both
    // engines derive the SAME augmented text from the base table
    // (deterministic email/phone/IPv4 plants keyed on doc_id — the %11
    // phones under doc 100 even land BELOW the 7-digit minimum, so the
    // no-match boundary is exercised too), then count per-family matches
    // on the original and redact sequentially (email → phone → IP). The
    // patterns are RE2-safe by construction (TextAnalysis.Pii) and
    // embedded verbatim in the oracle — one source of truth, two regex
    // engines, bit-identical output strings.
    "ext_pii_redact" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val aug = docs.select(col("doc_id"), concat(
          coalesce(col("text"), lit("")),
          when(col("doc_id") % 7 === 0, concat(lit(" contact user"),
            col("doc_id").cast("string"),
            lit("@mail.example.com for details"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0, concat(lit(" call +1555"),
            col("doc_id").cast("string"), lit(" now"))).otherwise(lit("")),
          when(col("doc_id") % 13 === 0, concat(lit(" from host 10.0."),
            (col("doc_id") % 256).cast("string"), lit(".25")))
            .otherwise(lit(""))).as("text"))
        TextAnalysis.piiRedact(aug)
      },
      s"""WITH aug AS (
         |  SELECT doc_id,
         |    coalesce(text, '')
         |    || CASE WHEN doc_id % 7 = 0 THEN ' contact user'
         |         || CAST(doc_id AS VARCHAR) || '@mail.example.com for details'
         |       ELSE '' END
         |    || CASE WHEN doc_id % 11 = 0 THEN ' call +1555'
         |         || CAST(doc_id AS VARCHAR) || ' now' ELSE '' END
         |    || CASE WHEN doc_id % 13 = 0 THEN ' from host 10.0.'
         |         || CAST(doc_id % 256 AS VARCHAR) || '.25' ELSE '' END AS t
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '${TextAnalysis.Pii.Email}')) AS BIGINT)
         |    AS n_emails,
         |  CAST(len(regexp_extract_all(t, '${TextAnalysis.Pii.Phone}')) AS BIGINT)
         |    AS n_phones,
         |  CAST(len(regexp_extract_all(t, '${TextAnalysis.Pii.Ipv4}')) AS BIGINT)
         |    AS n_ips,
         |  regexp_replace(regexp_replace(regexp_replace(t,
         |    '${TextAnalysis.Pii.Email}', '[EMAIL]', 'g'),
         |    '${TextAnalysis.Pii.Phone}', '[PHONE]', 'g'),
         |    '${TextAnalysis.Pii.Ipv4}', '[IP]', 'g') AS redacted
         |FROM aug""".stripMargin),

    // REAL raster resize (round 13 — the fake geometry-only form is
    // retired to test helpers): decode the PNG, box-fit the dims into a
    // 32×32 target (exact integer geometry), then RESAMPLE the decoded
    // raster by exact index mapping (out(cx,cy) = in(cx·w div out_w,
    // cy·h div out_h) — the dHash grid convention, cross-engine
    // re-derivable where bilinear weights are not). sum_resized
    // checksums the output raster: a resampler reading even one wrong
    // source pixel breaks the hash. The oracle re-derives geometry AND
    // every resampled pixel from the generation formula.
    "mm_resize" -> QueryDef(
      (s, dir) => Multimodal.resizeImages(s,
        Multimodal.synthesizeImages(s, Tables.documents(s, dir)),
        target = 32L).toDF(),
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(16 + strpos('0123456789abcdef',
        |      substr(md5(coalesce(text, '')), 1, 1)) - 1 AS BIGINT) AS width,
        |    CAST(16 + strpos('0123456789abcdef',
        |      substr(md5(coalesce(text, '')), 2, 1)) - 1 AS BIGINT) AS height
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, width, height,
        |    width * 32 // greatest(width, height) AS out_w,
        |    height * 32 // greatest(width, height) AS out_h
        |  FROM d),
        |px AS (
        |  SELECT o.doc_id, o.width, o.height, o.out_w, o.out_h,
        |    (o.doc_id * 31 + (cx.cx * o.width) // o.out_w
        |      + (cy.cy * o.height) // o.out_h) % 256 AS g
        |  FROM o,
        |    LATERAL unnest(generate_series(0, o.out_w - 1)) AS cx(cx),
        |    LATERAL unnest(generate_series(0, o.out_h - 1)) AS cy(cy))
        |SELECT doc_id, width, height,
        |  CAST(out_w AS BIGINT) AS out_w, CAST(out_h AS BIGINT) AS out_h,
        |  CAST(sum(g) AS BIGINT) AS sum_resized
        |FROM px GROUP BY doc_id, width, height, out_w, out_h""".stripMargin),

    // Frame-sample stage over REAL full-decode frame counts (round 13 —
    // the fake strlen-derived count is retired): k=8 evenly-spaced
    // indices per clip from decodeVideos' container-directory n_frames,
    // deduplicated when the clip is shorter than k — the row-multiplying
    // stage, run after the payload is projected away. (The k=4 sibling
    // mm_video_frame_sample drives the same arithmetic from the HEADER
    // probe — the two production shapes, both under oracle.)
    "mm_frame_sample" -> QueryDef(
      (s, dir) => Multimodal.sampleVideoFrames(s,
        Multimodal.decodeVideos(s,
          Multimodal.synthesizeVideos(s, Tables.documents(s, dir))),
        k = 8).toDF(),
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(2 + strpos('0123456789abcdef',
        |      substr(md5(coalesce(text, '')), 1, 1)) - 1 AS BIGINT) AS n_frames
        |  FROM documents)
        |SELECT doc_id,
        |  unnest(list_distinct(list_transform(generate_series(0, 7),
        |    i -> CAST(i * n_frames // 8 AS BIGINT)))) AS frame_idx,
        |  n_frames
        |FROM d""".stripMargin),

    // REAL video decode (multi-frame javax.imageio GIF over deterministic
    // animated-GIF fixtures — Multimodal.synthesizeVideos/decodeVideos):
    // n_frames from the container's image directory, width/height from
    // frame 0, sum_gray over EVERY pixel of EVERY decoded frame. The
    // fixture's 256-gray indexed palette makes the GIF encoding lossless
    // and the per-frame gradient closed-form, so the oracle re-derives
    // frame count AND per-frame pixel stats from the generation formula
    // without a decoder — a reader that missed a frame or mangled a
    // pixel breaks sum_gray.
    "mm_video_decode" -> QueryDef(
      (s, dir) => Multimodal.decodeVideos(s,
        Multimodal.synthesizeVideos(s, Tables.documents(s, dir))).toDF(),
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(2 + strpos('0123456789abcdef', substr(md5(coalesce(text, '')), 1, 1)) - 1
        |         AS BIGINT) AS n_frames,
        |    CAST(8 + strpos('0123456789abcdef', substr(md5(coalesce(text, '')), 2, 1)) - 1
        |         AS BIGINT) AS width,
        |    CAST(8 + strpos('0123456789abcdef', substr(md5(coalesce(text, '')), 3, 1)) - 1
        |         AS BIGINT) AS height
        |  FROM documents),
        |px AS (
        |  SELECT d.doc_id, d.n_frames, d.width, d.height, f.f, x.x, y.y
        |  FROM d,
        |    LATERAL unnest(generate_series(0, d.n_frames - 1)) AS f(f),
        |    LATERAL unnest(generate_series(0, d.width - 1)) AS x(x),
        |    LATERAL unnest(generate_series(0, d.height - 1)) AS y(y))
        |SELECT doc_id, n_frames, width, height,
        |  CAST(sum((doc_id * 31 + x + y + 7 * f) % 256) AS BIGINT) AS sum_gray,
        |  CAST((doc_id * 31) % 256 AS BIGINT) AS px000
        |FROM px GROUP BY doc_id, n_frames, width, height""".stripMargin),

    // REAL video decode, PRODUCTION CONTAINER shape (round 13): MJPEG-
    // in-MP4 — real ImageIO JPEG frames inside a spec-conformant
    // ISO-BMFF container with a genuine sample table
    // (Multimodal.synthesizeMjpegMp4). The decode walks the box tree to
    // stsz/stco under moov/trak/mdia/minf/stbl, slices every sample out
    // of mdat by its table offset, and runs a REAL JPEG decode per
    // frame (Multimodal.decodeMjpegMp4) — genuine container-parse →
    // per-frame codec decode. JPEG is lossy, so the contract pins
    // invariants (the mm_image_decode_jpeg lesson): n_frames and
    // dimensions exact (container fields, required to match every
    // decoded raster), and EVERY frame's raster within a 3-gray-level
    // mean deviation of the generation formula — one mangled or skipped
    // frame flips mean_dev_ok and breaks the hash.
    "mm_video_decode_mjpeg" -> QueryDef(
      (s, dir) => Multimodal.decodeMjpegMp4(s,
        Multimodal.synthesizeMjpegMp4(s, Tables.documents(s, dir))).toDF(),
      """SELECT doc_id,
        |  CAST(2 + strpos('0123456789abcdef',
        |    substr(md5(coalesce(text, '')), 1, 1)) - 1 AS BIGINT) AS n_frames,
        |  CAST(16 + strpos('0123456789abcdef',
        |    substr(md5(coalesce(text, '')), 2, 1)) - 1 AS BIGINT) AS width,
        |  CAST(16 + strpos('0123456789abcdef',
        |    substr(md5(coalesce(text, '')), 3, 1)) - 1 AS BIGINT) AS height,
        |  TRUE AS mean_dev_ok
        |FROM documents""".stripMargin),

    // Frame sampling driven by the REAL container-derived frame count:
    // k=4 evenly-spaced indices per clip, deduplicated when the clip is
    // shorter than k. Round 9: n_frames comes from the HEADER probe
    // (Multimodal.probeVideoFrames — container directory walk, zero
    // raster decodes), the production shape for metadata-driven
    // sampling; probe ≡ decode frame counts is spec-pinned on the same
    // fixtures (MultimodalSpec), and mm_video_decode keeps the
    // pixel-exact full decode under oracle.
    "mm_video_frame_sample" -> QueryDef(
      (s, dir) => Multimodal.sampleProbedFrames(s,
        Multimodal.probeVideoFrames(s,
          Multimodal.synthesizeVideos(s, Tables.documents(s, dir))),
        k = 4).toDF(),
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(2 + strpos('0123456789abcdef', substr(md5(coalesce(text, '')), 1, 1)) - 1
        |         AS BIGINT) AS n_frames
        |  FROM documents)
        |SELECT doc_id,
        |  unnest(list_distinct(list_transform(generate_series(0, 3),
        |    i -> CAST(i * n_frames // 4 AS BIGINT)))) AS frame_idx,
        |  n_frames
        |FROM d""".stripMargin),

    // REAL ISO-BMFF/MP4 header parse (round 12): production video ships
    // in MP4 containers, and its metadata path needs NO codec — the
    // probe walks the (size, 4CC) box tree with pure JDK byte reads and
    // parses the v0 mvhd/tkhd layouts (timescale, duration, track id,
    // 16.16 fixed-point dimensions). Fixtures are REAL minimal
    // conformant containers synthesized from the md5 formula (an
    // optional 'free' box on md5 char 6 parity forces an actual box
    // WALK, not fixed offsets); the oracle re-derives every parsed
    // field from documents alone. duration_ms is exact: duration is a
    // timescale multiple by construction.
    "mm_video_probe_mp4" -> QueryDef(
      (s, dir) => Multimodal.probeMp4(s,
        Multimodal.synthesizeMp4(s, Tables.documents(s, dir))).toDF(),
      """WITH c AS (
        |  SELECT doc_id, md5(coalesce(text, '')) AS h FROM documents),
        |d AS (
        |  SELECT doc_id,
        |    CAST(1 + strpos('0123456789abcdef', substr(h, 1, 1)) - 1
        |         AS BIGINT) AS secs,
        |    CAST(600 * (1 + strpos('0123456789abcdef', substr(h, 2, 1)) - 1)
        |         AS BIGINT) AS timescale,
        |    CAST(16 + strpos('0123456789abcdef', substr(h, 3, 1)) - 1
        |         AS BIGINT) AS width,
        |    CAST(16 + strpos('0123456789abcdef', substr(h, 4, 1)) - 1
        |         AS BIGINT) AS height,
        |    CAST(1 + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) % 4
        |         AS BIGINT) AS track_id,
        |    (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) % 2 = 0
        |      AS with_free
        |  FROM c)
        |SELECT doc_id, 'isom' AS major_brand, timescale,
        |  secs * timescale AS duration, secs * 1000 AS duration_ms,
        |  width, height, track_id,
        |  CAST(CASE WHEN with_free THEN 3 ELSE 2 END AS BIGINT)
        |    AS n_top_boxes
        |FROM d""".stripMargin),

    // REAL image decode (javax.imageio over deterministic PNG fixtures —
    // Multimodal.synthesizeImages/decodeImages): the decoded RASTER
    // yields width/height, the full-pixel gray sum, and the top-left
    // pixel; the resize geometry (the mm_resize integer box-fit) runs on
    // the real decoded dims. PNG is lossless and the fixture is a closed-
    // form gradient, so the oracle re-derives every value from the
    // generation formula without a decoder — a decode that mangled even
    // one pixel breaks sum_gray.
    "mm_image_decode" -> QueryDef(
      (s, dir) => Multimodal.decodeImages(s,
        Multimodal.synthesizeImages(s, Tables.documents(s, dir))).toDF()
        .withColumn("out_w",
          expr("CAST(width * 256 DIV greatest(width, height) AS BIGINT)"))
        .withColumn("out_h",
          expr("CAST(height * 256 DIV greatest(width, height) AS BIGINT)")),
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(16 + strpos('0123456789abcdef', substr(md5(coalesce(text, '')), 1, 1)) - 1
        |         AS BIGINT) AS width,
        |    CAST(16 + strpos('0123456789abcdef', substr(md5(coalesce(text, '')), 2, 1)) - 1
        |         AS BIGINT) AS height
        |  FROM documents),
        |px AS (
        |  SELECT d.doc_id, d.width, d.height, x.x, y.y
        |  FROM d,
        |    LATERAL unnest(generate_series(0, d.width - 1)) AS x(x),
        |    LATERAL unnest(generate_series(0, d.height - 1)) AS y(y))
        |SELECT doc_id, width, height,
        |  CAST(sum((doc_id * 31 + x + y) % 256) AS BIGINT) AS sum_gray,
        |  CAST((doc_id * 31) % 256 AS BIGINT) AS px00,
        |  CAST(width * 256 // greatest(width, height) AS BIGINT) AS out_w,
        |  CAST(height * 256 // greatest(width, height) AS BIGINT) AS out_h
        |FROM px GROUP BY doc_id, width, height""".stripMargin),

    // REAL JPEG decode (round 10 — the one codec-breadth extension pure
    // JDK still offers): the SAME gradient fixtures, written through
    // ImageIO's lossy JPEG encoder and decoded back through the SAME
    // decodeImages stage (the codec swaps, the plumbing doesn't). JPEG
    // is lossy, so the contract changes shape (the logisticFit lesson:
    // pin invariants, not exact values): DIMENSIONS survive exactly —
    // the oracle re-derives them from md5(coalesce(text, '')) per row — while the
    // raster only has to land within a mean-deviation budget vs the
    // generation formula (|Σgray − Σexpected| / (w·h) ≤ 3 gray levels;
    // measured at sf0.01: mean 0.08, max 0.68 — the 4× margin covers
    // the DCT ringing at the mod-256 wrap edges). The expected sum is
    // computed IN-PLAN from the closed form by a codegen'd HOF — no
    // driver loop, no second decode.
    // Cross-modal alignment gate (round 11 — the LAION §3 filter shape):
    // every document carries a synthesized (PNG, caption) pair; the
    // image side is REALLY decoded (ImageIO raster → exact quadrant gray
    // sums), the caption side parsed, and the pair kept only when the
    // centered profiles agree (cosine ≥ 9/10 as DECIMAL/HUGEINT integer
    // cross-multiplication — no float ever compared). Captions are
    // md5-planted: even hex-3 → the TRUE profile (aligned by
    // construction, cos = 1 exactly), odd → an md5 decoy (the class the
    // gate drops; a decoy can land parallel by chance — the verdict is
    // deterministic either way and the oracle re-derives it). The
    // oracle rebuilds BOTH modalities from `documents` alone: pixel
    // formula → quadrant sums, md5 chars → caption, same integer gate.
    "mm_alignment_gate" -> QueryDef(
      (s, dir) => Multimodal.alignmentGate(s,
        Multimodal.synthesizeCaptionedImages(s, Tables.documents(s, dir))),
      """WITH m AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents),
        |dims AS (
        |  SELECT doc_id, hx,
        |    CAST(16 + strpos('0123456789abcdef', substr(hx, 1, 1)) - 1
        |         AS BIGINT) AS w,
        |    CAST(16 + strpos('0123456789abcdef', substr(hx, 2, 1)) - 1
        |         AS BIGINT) AS hh,
        |    (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) % 2 = 0
        |      AS is_aligned
        |  FROM m),
        |px AS (
        |  SELECT doc_id,
        |    CASE WHEN 2 * x.x >= w THEN 1 ELSE 0 END
        |      + CASE WHEN 2 * y.y >= hh THEN 2 ELSE 0 END AS qi,
        |    (doc_id * 31 + x.x + y.y) % 256 AS g
        |  FROM dims,
        |    LATERAL unnest(generate_series(0, w - 1)) AS x(x),
        |    LATERAL unnest(generate_series(0, hh - 1)) AS y(y)),
        |q AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN qi = 0 THEN g ELSE 0 END) AS BIGINT) AS q0,
        |    CAST(sum(CASE WHEN qi = 1 THEN g ELSE 0 END) AS BIGINT) AS q1,
        |    CAST(sum(CASE WHEN qi = 2 THEN g ELSE 0 END) AS BIGINT) AS q2,
        |    CAST(sum(CASE WHEN qi = 3 THEN g ELSE 0 END) AS BIGINT) AS q3
        |  FROM px GROUP BY 1),
        |cap AS (
        |  SELECT d.doc_id,
        |    CASE WHEN d.is_aligned THEN q.q0 ELSE
        |      CAST(strpos('0123456789abcdef', substr(d.hx, 5, 1)) AS BIGINT)
        |    END AS c0,
        |    CASE WHEN d.is_aligned THEN q.q1 ELSE
        |      CAST(strpos('0123456789abcdef', substr(d.hx, 6, 1)) AS BIGINT)
        |    END AS c1,
        |    CASE WHEN d.is_aligned THEN q.q2 ELSE
        |      CAST(strpos('0123456789abcdef', substr(d.hx, 7, 1)) AS BIGINT)
        |    END AS c2,
        |    CASE WHEN d.is_aligned THEN q.q3 ELSE
        |      CAST(strpos('0123456789abcdef', substr(d.hx, 8, 1)) AS BIGINT)
        |    END AS c3
        |  FROM dims d JOIN q USING (doc_id)),
        |v AS (
        |  SELECT q.doc_id, q.q0, q.q1, q.q2, q.q3,
        |    cap.c0, cap.c1, cap.c2, cap.c3,
        |    4 * q.q0 - (q.q0 + q.q1 + q.q2 + q.q3) AS a0,
        |    4 * q.q1 - (q.q0 + q.q1 + q.q2 + q.q3) AS a1,
        |    4 * q.q2 - (q.q0 + q.q1 + q.q2 + q.q3) AS a2,
        |    4 * q.q3 - (q.q0 + q.q1 + q.q2 + q.q3) AS a3,
        |    4 * cap.c0 - (cap.c0 + cap.c1 + cap.c2 + cap.c3) AS b0,
        |    4 * cap.c1 - (cap.c0 + cap.c1 + cap.c2 + cap.c3) AS b1,
        |    4 * cap.c2 - (cap.c0 + cap.c1 + cap.c2 + cap.c3) AS b2,
        |    4 * cap.c3 - (cap.c0 + cap.c1 + cap.c2 + cap.c3) AS b3
        |  FROM q JOIN cap USING (doc_id)),
        |s AS (
        |  SELECT doc_id, q0, q1, q2, q3, c0, c1, c2, c3,
        |    CAST(a0*b0 + a1*b1 + a2*b2 + a3*b3 AS BIGINT) AS dot,
        |    CAST(a0*a0 + a1*a1 + a2*a2 + a3*a3 AS HUGEINT) AS na2,
        |    CAST(b0*b0 + b1*b1 + b2*b2 + b3*b3 AS HUGEINT) AS nb2
        |  FROM v)
        |SELECT doc_id, q0, q1, q2, q3, c0, c1, c2, c3, dot,
        |  (na2 = 0 AND nb2 = 0) OR
        |  (dot > 0 AND
        |   100 * CAST(dot AS HUGEINT) * CAST(dot AS HUGEINT) >= 81 * na2 * nb2)
        |  AS aligned
        |FROM s""".stripMargin),

    "mm_image_decode_jpeg" -> QueryDef(
      (s, dir) => {
        val dec = Multimodal.decodeImages(s,
          Multimodal.synthesizeImages(s, Tables.documents(s, dir),
            format = "jpg")).toDF()
        dec.withColumn("exp_sum", expr(
          "aggregate(sequence(0, CAST(width AS INT) - 1), 0L, (acc, x) " +
            "-> acc + aggregate(sequence(0, CAST(height AS INT) - 1), " +
            "0L, (a2, y) -> a2 + (doc_id * 31 + x + y) % 256))"))
          .select(col("doc_id"), col("width"), col("height"),
            ((abs(col("sum_gray") - col("exp_sum")).cast("double") /
              (col("width") * col("height")).cast("double")) <= lit(3.0))
              .as("mean_dev_ok"))
      },
      """SELECT doc_id,
        |  CAST(16 + strpos('0123456789abcdef', substr(md5(coalesce(text, '')), 1, 1)) - 1
        |       AS BIGINT) AS width,
        |  CAST(16 + strpos('0123456789abcdef', substr(md5(coalesce(text, '')), 2, 1)) - 1
        |       AS BIGINT) AS height,
        |  TRUE AS mean_dev_ok
        |FROM documents""".stripMargin),

    // Image near-dup detection by perceptual dHash (round 9) — the
    // multimodal face of the dedup family: REAL PNG decodes hash to a
    // 63-bit neighbor-difference fingerprint (integer area-average 9×8
    // grid — bilinear resize would not be cross-engine re-derivable),
    // candidate pairs come from NINE 7-bit band buckets (63 = 9×7:
    // hamming ≤ 8 < 9 bands ⇒ some band matches — pigeonhole-exact,
    // never all-pairs), verified by exact bit_count(xor) ≤ 8. Fixtures
    // carry 50 PLANTED brightness-shifted twins (dHash is invariant to
    // uniform shifts except at mod wraps — measured hamming 0-8, all
    // caught) over XOR-textured bases (measured: only 36 background
    // pairs collide among ~125k). The oracle re-derives the ENTIRE
    // chain — pixels from the generation formula, grid, bits, hash,
    // brute-force pairing (a different pairing algorithm).
    "mm_image_dhash" -> QueryDef(
      (s, dir) => {
        val hashes = Multimodal.dhashImages(s,
          Multimodal.synthesizeImagesVaried(s, Tables.documents(s, dir)))
          .toDF().localCheckpoint(eager = false)
        val bands = (0 until 9).map(b =>
          hashes.select(col("doc_id"), col("dhash"), lit(b).as("band"),
            shiftrightunsigned(col("dhash"), b * 7)
              .bitwiseAND(lit(0x7FL)).as("bkey")))
          .reduce(_ unionByName _)
        bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") &&
            col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
            col("x.dhash").as("ha"), col("y.dhash").as("hb"))
          .distinct()
          .withColumn("hamming",
            bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
          .filter(col("hamming") <= 8)
          .select(col("doc_a"), col("doc_b"), col("hamming"),
            (col("doc_b") === col("doc_a") + 1000000L).as("is_planted"))
      },
      """WITH ids AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents),
        |imgs AS (
        |  SELECT doc_id AS img_id, doc_id AS pid, 0 AS shift, hx FROM ids
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id, 5, hx FROM ids
        |  WHERE doc_id % 10 = 0),
        |dims AS (
        |  SELECT img_id, pid, shift,
        |    CAST(16 + strpos('0123456789abcdef', substr(hx, 1, 1)) - 1
        |         AS BIGINT) AS w,
        |    CAST(16 + strpos('0123456789abcdef', substr(hx, 2, 1)) - 1
        |         AS BIGINT) AS hh
        |  FROM imgs),
        |px AS (
        |  SELECT img_id, (x.x * 9) // w AS c, (y.y * 8) // hh AS r,
        |    (((xor(x.x * (3 + pid % 7), y.y * (5 + pid % 11)) + pid) % 256)
        |      + shift) % 256 AS g
        |  FROM dims,
        |    LATERAL unnest(generate_series(0, w - 1)) AS x(x),
        |    LATERAL unnest(generate_series(0, hh - 1)) AS y(y)),
        |cells AS (
        |  SELECT img_id, r, c, CAST(sum(g) AS BIGINT) // count(*) AS a
        |  FROM px GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT l.img_id, l.r * 8 + l.c AS k,
        |    CASE WHEN rr.a > l.a THEN 1 ELSE 0 END AS b
        |  FROM cells l JOIN cells rr
        |    ON rr.img_id = l.img_id AND rr.r = l.r AND rr.c = l.c + 1
        |  WHERE l.c < 8 AND l.r < 8 AND l.r * 8 + l.c < 63),
        |hashes AS (
        |  SELECT img_id, CAST(sum(CASE WHEN b = 1
        |    THEN (CAST(1 AS BIGINT) << CAST(k AS INTEGER)) ELSE 0 END)
        |    AS BIGINT) AS dh
        |  FROM bits GROUP BY 1)
        |SELECT a.img_id AS doc_a, b2.img_id AS doc_b,
        |  CAST(bit_count(xor(a.dh, b2.dh)) AS BIGINT) AS hamming,
        |  b2.img_id = a.img_id + 1000000 AS is_planted
        |FROM hashes a JOIN hashes b2 ON a.img_id < b2.img_id
        |WHERE bit_count(xor(a.dh, b2.dh)) <= 8""".stripMargin),

    // Audio near-dup detection by energy-profile fingerprint (round 9)
    // — completing the near-dup family across modalities (text
    // SimHash, image dHash, audio THIS): real WAV decodes hash to a
    // 63-bit adjacent-window energy-comparison fingerprint (64 integer
    // windows, exact mean |s| per window), candidates via THREE 21-bit
    // bands (hamming ≤ 2 < 3 bands — pigeonhole-exact), verified by
    // popcount. 50 planted amplitude-scaled twins all land at hamming
    // 0 (a volume change scales every window together); the md5-driven
    // energy envelopes keep unrelated docs far apart (0 background
    // collisions at ≤ 2; a smooth shared texture measured 178). Oracle
    // re-derives samples, windows, bits, hash, and brute-force pairs.
    "mm_audio_fingerprint" -> QueryDef(
      (s, dir) => {
        val hashes = Multimodal.audioFingerprints(s,
          Multimodal.synthesizeAudioVaried(s, Tables.documents(s, dir)))
          .toDF().localCheckpoint(eager = false)
        val bands = (0 until 3).map(b =>
          hashes.select(col("doc_id"), col("ahash"), lit(b).as("band"),
            shiftrightunsigned(col("ahash"), b * 21)
              .bitwiseAND(lit(0x1FFFFFL)).as("bkey")))
          .reduce(_ unionByName _)
        bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") &&
            col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
            col("x.ahash").as("ha"), col("y.ahash").as("hb"))
          .distinct()
          .withColumn("hamming",
            bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
          .filter(col("hamming") <= 2)
          .select(col("doc_a"), col("doc_b"), col("hamming"),
            (col("doc_b") === col("doc_a") + 1000000L).as("is_planted"))
      },
      """WITH ids AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents),
        |snd AS (
        |  SELECT doc_id AS snd_id, doc_id AS pid, FALSE AS scaled, hx
        |  FROM ids
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id, TRUE, hx FROM ids
        |  WHERE doc_id % 10 = 0),
        |dims AS (
        |  SELECT snd_id, pid, scaled, hx,
        |    CAST(64 + 4 * (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1)
        |         AS BIGINT) AS n
        |  FROM snd),
        |raw AS (
        |  SELECT snd_id, scaled, (i.i * 64) // n AS w,
        |    ((xor(i.i * (31 + pid % 13), pid * 7) % 32768)
        |      * strpos('0123456789abcdef',
        |          substr(hx, CAST((((i.i * 64) // n) % 16) + 1 AS INTEGER),
        |            1))) // 16 AS base
        |  FROM dims, LATERAL unnest(generate_series(0, n - 1)) AS i(i)),
        |smp AS (
        |  SELECT snd_id, w,
        |    CASE WHEN scaled THEN (base * 9) // 10 ELSE base END AS s
        |  FROM raw),
        |en AS (
        |  SELECT snd_id, w, CAST(sum(s) AS BIGINT) // count(*) AS e
        |  FROM smp GROUP BY 1, 2),
        |bits AS (
        |  SELECT l.snd_id, l.w AS k,
        |    CASE WHEN rr.e > l.e THEN 1 ELSE 0 END AS b
        |  FROM en l JOIN en rr ON rr.snd_id = l.snd_id AND rr.w = l.w + 1
        |  WHERE l.w < 63),
        |hashes AS (
        |  SELECT snd_id, CAST(sum(CASE WHEN b = 1
        |    THEN (CAST(1 AS BIGINT) << CAST(k AS INTEGER)) ELSE 0 END)
        |    AS BIGINT) AS ah
        |  FROM bits GROUP BY 1)
        |SELECT a.snd_id AS doc_a, b2.snd_id AS doc_b,
        |  CAST(bit_count(xor(a.ah, b2.ah)) AS BIGINT) AS hamming,
        |  b2.snd_id = a.snd_id + 1000000 AS is_planted
        |FROM hashes a JOIN hashes b2 ON a.snd_id < b2.snd_id
        |WHERE bit_count(xor(a.ah, b2.ah)) <= 2""".stripMargin),

    // REAL audio decode (javax.sound.sampled over deterministic 16-bit
    // PCM WAV fixtures — Multimodal.synthesizeAudio/decodeAudio): header
    // fields from the parsed RIFF container, s0/sum_abs from the decoded
    // frames. PCM is lossless and the waveform is closed-form, so the
    // oracle re-derives every value from the generation formula without
    // a decoder — a decode that dropped or mangled one sample breaks
    // sum_abs.
    "mm_audio_decode" -> QueryDef(
      (s, dir) => Multimodal.decodeAudio(s,
        Multimodal.synthesizeAudio(s, Tables.documents(s, dir))).toDF(),
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(64 + 4 * (strpos('0123456789abcdef', substr(md5(coalesce(text, '')), 1, 1)) - 1)
        |         AS BIGINT) AS n_samples
        |  FROM documents),
        |sm AS (
        |  SELECT d.doc_id, d.n_samples, i.i,
        |    (d.doc_id * 31 + i.i * 7) % 65536 - 32768 AS s
        |  FROM d, LATERAL unnest(generate_series(0, d.n_samples - 1)) AS i(i))
        |SELECT doc_id, n_samples, CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(min(CASE WHEN i = 0 THEN s END) AS BIGINT) AS s0,
        |  CAST(sum(abs(s)) AS BIGINT) AS sum_abs
        |FROM sm GROUP BY doc_id, n_samples""".stripMargin),

    // REAL mixed-modal decode routing (round 13 — the last fake-decode
    // registration retired): one binary media column carrying three
    // real codecs (PNG / RIFF-WAVE PCM / animated GIF by doc_id mod 3),
    // routed by media_type to the matching REAL decoder and unified
    // into one typed feature frame — the production shape for a
    // heterogeneous 100 TB media corpus (scan-level routing filters,
    // zero shuffles, payloads never outlive their decode stage). All
    // three codecs are lossless over these fixtures, so the oracle
    // re-derives every decoded value — pixel sums, |sample| sums, frame
    // counts — from the generation formulas, hash-exact.
    "mm_decode_features" -> QueryDef(
      (s, dir) => Multimodal.decodeMixed(s,
        Multimodal.synthesizeMixedMedia(s, Tables.documents(s, dir))).toDF(),
      """WITH hx AS (
        |  SELECT doc_id, md5(coalesce(text, '')) AS h FROM documents),
        |img AS (
        |  SELECT doc_id,
        |    CAST(16 + strpos('0123456789abcdef', substr(h, 1, 1)) - 1
        |         AS BIGINT) AS w,
        |    CAST(16 + strpos('0123456789abcdef', substr(h, 2, 1)) - 1
        |         AS BIGINT) AS hh
        |  FROM hx WHERE doc_id % 3 = 0),
        |imgf AS (
        |  SELECT i.doc_id, 'image' AS media_type, i.w AS width,
        |    i.hh AS height, CAST(1 AS BIGINT) AS n_frames,
        |    CAST(sum((i.doc_id * 31 + x.x + y.y) % 256) AS BIGINT)
        |      AS content_sum
        |  FROM img i,
        |    LATERAL unnest(generate_series(0, i.w - 1)) AS x(x),
        |    LATERAL unnest(generate_series(0, i.hh - 1)) AS y(y)
        |  GROUP BY 1, 2, 3, 4, 5),
        |aud AS (
        |  SELECT doc_id,
        |    CAST(64 + 4 * (strpos('0123456789abcdef', substr(h, 1, 1)) - 1)
        |         AS BIGINT) AS n
        |  FROM hx WHERE doc_id % 3 = 1),
        |audf AS (
        |  SELECT a.doc_id, 'audio' AS media_type, a.n AS width,
        |    CAST(1 AS BIGINT) AS height, CAST(1 AS BIGINT) AS n_frames,
        |    CAST(sum(abs((a.doc_id * 31 + i.i * 7) % 65536 - 32768))
        |      AS BIGINT) AS content_sum
        |  FROM aud a, LATERAL unnest(generate_series(0, a.n - 1)) AS i(i)
        |  GROUP BY 1, 2, 3, 4, 5),
        |vid AS (
        |  SELECT doc_id,
        |    CAST(2 + strpos('0123456789abcdef', substr(h, 1, 1)) - 1
        |         AS BIGINT) AS f,
        |    CAST(8 + strpos('0123456789abcdef', substr(h, 2, 1)) - 1
        |         AS BIGINT) AS w,
        |    CAST(8 + strpos('0123456789abcdef', substr(h, 3, 1)) - 1
        |         AS BIGINT) AS hh
        |  FROM hx WHERE doc_id % 3 = 2),
        |vidf AS (
        |  SELECT v.doc_id, 'video' AS media_type, v.w AS width,
        |    v.hh AS height, v.f AS n_frames,
        |    CAST(sum((v.doc_id * 31 + x.x + y.y + 7 * ff.f) % 256)
        |      AS BIGINT) AS content_sum
        |  FROM vid v,
        |    LATERAL unnest(generate_series(0, v.f - 1)) AS ff(f),
        |    LATERAL unnest(generate_series(0, v.w - 1)) AS x(x),
        |    LATERAL unnest(generate_series(0, v.hh - 1)) AS y(y)
        |  GROUP BY 1, 2, 3, 4, 5)
        |SELECT * FROM imgf
        |UNION ALL SELECT * FROM audf
        |UNION ALL SELECT * FROM vidf""".stripMargin),

    // DQ (ext, round 9) — declarative data-quality gate
    // (Deequ/Great-Expectations shape): a six-check suite over events
    // producing the (check, column, observed, threshold, passed) report
    // a pipeline asserts on before shipping a partition downstream.
    // One aggregate per check (the columnProfile anti-Expand shape —
    // see Expectations scaladoc); observed values are ratios of exact
    // longs, so the whole report hash-pairs. The in_range band is
    // deliberately tighter than the data (value spans ~0..490; the
    // ≤100 band fails) so the report carries a REAL failure row — a
    // suite that can only say "passed" proves nothing.
    "ext_expectations" -> QueryDef(
      (s, dir) => {
        import graft.operators.Expectations._
        run(Tables.events(s, dir), Seq(
          Completeness("value", 0.95),
          Completeness("event_type", 1.0),
          Uniqueness("event_id", 1.0),
          InRange("value", 0.0, 100.0, 0.99),
          InSet("event_type",
            Seq("click", "purchase", "view", "signup", "error"), 1.0),
          MinCount(100.0)))
      },
      """SELECT 'completeness' AS check_name, 'value' AS col_name,
        |  CAST(count(value) AS DOUBLE)
        |    / CAST(greatest(count(*), 1) AS DOUBLE) AS observed,
        |  0.95 AS threshold,
        |  CAST(count(value) AS DOUBLE)
        |    / CAST(greatest(count(*), 1) AS DOUBLE) >= 0.95 AS passed
        |FROM events
        |UNION ALL
        |SELECT 'completeness', 'event_type',
        |  CAST(count(event_type) AS DOUBLE)
        |    / CAST(greatest(count(*), 1) AS DOUBLE),
        |  1.0,
        |  CAST(count(event_type) AS DOUBLE)
        |    / CAST(greatest(count(*), 1) AS DOUBLE) >= 1.0
        |FROM events
        |UNION ALL
        |SELECT 'uniqueness', 'event_id',
        |  CAST(count(DISTINCT event_id) AS DOUBLE)
        |    / CAST(greatest(count(event_id), 1) AS DOUBLE),
        |  1.0,
        |  CAST(count(DISTINCT event_id) AS DOUBLE)
        |    / CAST(greatest(count(event_id), 1) AS DOUBLE) >= 1.0
        |FROM events
        |UNION ALL
        |SELECT 'in_range', 'value',
        |  CAST(count(CASE WHEN value BETWEEN 0.0 AND 100.0 THEN 1 END)
        |    AS DOUBLE) / CAST(greatest(count(value), 1) AS DOUBLE),
        |  0.99,
        |  CAST(count(CASE WHEN value BETWEEN 0.0 AND 100.0 THEN 1 END)
        |    AS DOUBLE) / CAST(greatest(count(value), 1) AS DOUBLE) >= 0.99
        |FROM events
        |UNION ALL
        |SELECT 'in_set', 'event_type',
        |  CAST(count(CASE WHEN event_type IN
        |    ('click', 'purchase', 'view', 'signup', 'error') THEN 1 END)
        |    AS DOUBLE) / CAST(greatest(count(event_type), 1) AS DOUBLE),
        |  1.0,
        |  CAST(count(CASE WHEN event_type IN
        |    ('click', 'purchase', 'view', 'signup', 'error') THEN 1 END)
        |    AS DOUBLE) / CAST(greatest(count(event_type), 1) AS DOUBLE)
        |    >= 1.0
        |FROM events
        |UNION ALL
        |SELECT 'min_count', '*',
        |  CAST(count(*) AS DOUBLE), 100.0,
        |  CAST(count(*) AS DOUBLE) >= 100.0
        |FROM events""".stripMargin),

    // Gopher rule gate (round 11, Rae et al. 2021 §A1.1) — the
    // rule-based document filter, every rule an exact integer
    // cross-multiplication exported as its own boolean column
    // (mode-as-data). Thresholds are tuned so the corpus realizes BOTH
    // verdicts on four of the six rules (word count 277/500 pass, mean
    // word length 468, stopwords 446, top-token 427; alpha and symbol
    // never fail on this all-alphabetic corpus — their branch coverage
    // lives in GopherRulesSpec's hand frames). The stopword set is the
    // corpus-appropriate function-word list (see GopherParams scaladoc).
    "ext_gopher_rules" -> QueryDef(
      (s, dir) => TextAnalysis.gopherRules(
        Tables.documents(s, dir), gopherCorpusParams),
      gopherOracle(gopherCorpusParams)),

    // The SERVE/STREAM shape of the same gate, held to the SAME oracle:
    // one stateless projection, top-token count computed in-row — three
    // independent algorithms (Spark relational, Spark rowwise, DuckDB),
    // one hash.
    "ext_gopher_rules_rowwise" -> QueryDef(
      (s, dir) => TextAnalysis.gopherRulesRowwise(
        Tables.documents(s, dir), gopherCorpusParams),
      gopherOracle(gopherCorpusParams)),

    // DSIR data selection (round 11, Xie et al. 2023) — hashed-unigram
    // importance resampling toward a target domain (sources src0-3):
    // log importance weights as exact BIGINT micro-nats through the
    // shared quantized-ln chain, exact top-k cut exported as a
    // `selected` flag. Spark trains the 64-bucket model driver-side
    // and scores row-wise (no explode, no join); the oracle re-derives
    // everything relationally. Selection is verifiably target-enriched
    // at sf0.01 (41% of target docs selected vs 27% of the rest).
    "ext_dsir_select" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val target = docs.filter(col("source")
          .isin(dsirTargetSources: _*))
        val model = TextAnalysis.dsirTrain(docs, target, buckets = 64,
          seed = "r11ds", algo = "md5")
        TextAnalysis.dsirSelect(docs, model, k = 150)
      },
      dsirOracle(dsirTargetSources, buckets = 64, seed = "r11ds", k = 150)),

    // URL curation (round 11, RefinedWeb §3.1 / C4 §2.1) — the
    // acquisition-side gate: canonicalize messy URLs (ONE stateless
    // projection — the serve/stream shape, StreamingCuration.urlGate)
    // and verdict a domain blocklist. URLs are synthesized
    // deterministically (the mm_* pattern: md5 bit scatter, consecutive
    // doc pairs share one canonical resource), so the oracle re-derives
    // the RAW url too — synthesis, normalization, and verdict all
    // certified in one hash.
    "ext_url_normalize" -> QueryDef(
      (s, dir) => {
        val normed = UrlCuration.normalizeUrls(
          UrlCuration.synthesizeUrls(Tables.documents(s, dir), urlSeed))
        normed.select(col("doc_id"), col("url"), col("url_norm"),
          col("domain"),
          UrlCuration.blocklistVerdict(col("domain"), urlBlocklist)
            .as("blocked"))
      },
      duckUrlChain(urlSeed) +
        """
          |SELECT doc_id, url, url_norm, domain,
          |  CASE WHEN domain IS NOT NULL THEN
          |    domain = 'd7.example.com' OR
          |    ends_with(domain, '.d7.example.com') OR
          |    domain = 'd13.example.com' OR
          |    ends_with(domain, '.d13.example.com') END AS blocked
          |FROM nn""".stripMargin),

    // Exact-URL dedup — the cheapest dedup in the stack (one string
    // key, no content read; C4 keeps one page per canonical URL). First
    // doc_id per canonical URL survives; the verdict is mode-as-data.
    // Spark computes first-occurrence as an algebraic min aggregate
    // joined back (map-side combinable — a billion-crawl URL never
    // funnels into one window task); the oracle uses a struct-min
    // window — two shapes, one hash.
    "ext_url_dedup" -> QueryDef(
      (s, dir) => UrlCuration.urlDedup(UrlCuration.normalizeUrls(
          UrlCuration.synthesizeUrls(Tables.documents(s, dir), urlSeed)))
        .select(col("doc_id"), col("url_norm"), col("kept")),
      duckUrlChain(urlSeed) +
        """
          |SELECT doc_id, url_norm,
          |  CASE WHEN url_norm IS NOT NULL THEN
          |    doc_id = min(doc_id) OVER (PARTITION BY url_norm) END AS kept
          |FROM nn""".stripMargin),

    // Per-domain cap, both forms side by side: EXACT (hash-lottery
    // row_number per domain — the window is the exactness price) and
    // the SCALE threshold form (lottery·n < cap·1e6, one algebraic
    // count aggregate, no window — binomial around cap). Both verdicts
    // deterministic integer comparisons, both re-derived relationally.
    "ext_domain_cap" -> QueryDef(
      (s, dir) => {
        val normed = UrlCuration.normalizeUrls(
          UrlCuration.synthesizeUrls(Tables.documents(s, dir), urlSeed))
        UrlCuration.domainCap(normed, urlCap, urlCapSeed)
          .select(col("doc_id"), col("domain"), col("cap_kept"))
          .join(UrlCuration.domainCapThreshold(normed, urlCap, urlCapSeed)
            .select(col("doc_id"), col("cap_kept").as("thr_kept")),
            Seq("doc_id"))
      },
      duckUrlChain(urlSeed) +
        s""",
          |lot AS (
          |  SELECT doc_id, domain,
          |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
          |      || ':$urlCapSeed'), 1, 15)) AS BIGINT) % 1000000 AS l
          |  FROM nn),
          |rk AS (
          |  SELECT doc_id,
          |    row_number() OVER (PARTITION BY domain ORDER BY l, doc_id)
          |      AS rn,
          |    CAST(count(*) OVER (PARTITION BY domain) AS BIGINT) AS n
          |  FROM lot WHERE domain IS NOT NULL)
          |SELECT lot.doc_id, lot.domain,
          |  CASE WHEN lot.domain IS NOT NULL THEN rk.rn <= $urlCap END
          |    AS cap_kept,
          |  CASE WHEN lot.domain IS NOT NULL
          |    THEN lot.l * rk.n < $urlCap * 1000000 END AS thr_kept
          |FROM lot LEFT JOIN rk ON lot.doc_id = rk.doc_id""".stripMargin),

    // The MODERN curation stack end-to-end (round 11) — acquisition →
    // quality → perplexity → budget composed as ONE plan, each stage's
    // verdict exported as DATA so the whole pipeline's provenance frame
    // is hash-checked, not just each stage in isolation:
    //   1. URL gate (RefinedWeb §3.1): normalize, drop blocklisted
    //      domains, keep the first doc per canonical URL;
    //   2. Gopher rule gate on the survivors;
    //   3. CCNet perplexity filter TRAINED ON THE SURVIVORS (the
    //      reference split is hash-gated within stage 2 — curation
    //      order matters and the oracle re-derives it in the same
    //      order), keeping head+middle tertiles;
    //   4. token-budget cut (md5 lottery priority, greedy prefix).
    // Docs eliminated at stage k carry NULL verdicts for stages > k —
    // the provenance contract. All four stages' arithmetic is the
    // already-certified integer/quantized machinery of the standalone
    // rows; this row certifies their COMPOSITION (stage ordering,
    // survivor-set training, verdict joins).
    // STREAMING CERTIFIED IN THE ORACLE REGISTRY (round 12): every
    // streaming twin so far was spec-graded by necessity (DuckDB cannot
    // express micro-batch semantics) — this row closes that gap with
    // the snk3 mode-as-data pattern: the query fn RUNS a real bounded
    // 4-micro-batch stream (file source, maxFilesPerTrigger=1,
    // AvailableNow) through the STATEFUL exact-dedup operator
    // (dropDuplicatesWithinWatermark — state genuinely crosses batch
    // boundaries: a text's re-arrival in a later chunk must hit state
    // from an earlier one), then emits the stream-vs-batch comparison
    // AS DATA: per distinct text, how many rows the stream emitted
    // (exactly 1 = no duplicate emission AND no miss) and whether the
    // batch twin agrees. The oracle re-derives the only correct
    // answer — one emission per distinct text — from documents alone;
    // ANY cross-batch state failure (dropped state → n_emitted 2+,
    // over-dedup → a batch-only row with n_emitted 0) breaks the hash.
    // QueryDef.phased (round 15, VERDICT r14 item 2, all 16 stream rows):
    // the fixture phase (scratch landing chunks, reference tables, bounds
    // scans of the batch input) runs UNTIMED in the bench; the returned
    // thunk — stream start → state-machine drain → replay/verification →
    // read-back — is what the pin measures. Verify/fn still runs both.
    "stream_parity" -> QueryDef.phased(
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val base = Scratch.dir("stream-parity")
        val landing = s"$base/in"
        // Watermark delay scaled to the id range (round 13 — the fixed
        // '1 hour' delay silently dropped rows as late once max doc_id
        // exceeded 3600 at sf0.1+: ts spread is maxId seconds and mod-4
        // chunking puts the full range in EVERY micro-batch, so after
        // batch 0 the watermark sat at max_ts − 3600 and later-batch
        // rows below it were evicted — semantics broken exactly at the
        // scales the bench times).
        val stats = docs.agg(max(col("doc_id")), count(lit(1))).head()
        val maxId = stats.getLong(0)
        val nRows = stats.getLong(1)
        val delay = s"${maxId + 3600} seconds"
        // four deterministic chunk files: doc_id mod 4, written in
        // order so the file source replays them as four micro-batches —
        // PLUS a fifth RE-ARRIVAL chunk (every doc_id % 7 == 0 row
        // again, verbatim): its texts already hit dedup state from an
        // earlier chunk, so the stateful cross-batch suppression path
        // is genuinely exercised (round 13 — the graded fixtures carry
        // no duplicate texts, so without the re-arrival the cross-batch
        // dedup claim was vacuous). Any state loss re-emits these and
        // n_emitted lands at 2.
        (0 until 4).foreach { i =>
          docs.filter(pmod(col("doc_id"), lit(4)) === i)
            .coalesce(1).write.mode("overwrite").json(s"$landing/c$i")
        }
        docs.filter(pmod(col("doc_id"), lit(7)) === 0)
          .coalesce(1).write.mode("overwrite").json(s"$landing/c4_rearrival")
        () => graft.streaming.StreamTuning.withStatePartitions(s, nRows) {
        val in = s.readStream.schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", "1").json(s"$landing/*")
        val deduped = graft.streaming.StreamingDedup.exactDedupStream(
          in.withColumn("ts",
            timestamp_seconds(lit(1700000000L) + col("doc_id"))),
          "ts", delay)
        val outDir = s"$base/out"
        val q = deduped
          .select(md5(coalesce(col("text"), lit(""))).as("text_md5"))
          .writeStream.option("checkpointLocation", s"$base/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, id: Long) =>
            b.write.mode("overwrite").parquet(s"$outDir/batch=$id")
          }
          .start()
        q.awaitTermination()
        val emitted = s.read.parquet(outDir)
          .groupBy(col("text_md5")).agg(count(lit(1)).as("n_emitted"))
        val batch = docs
          .select(md5(coalesce(col("text"), lit(""))).as("text_md5"))
          .distinct().withColumn("in_batch", lit(true))
        val cmp = emitted.join(batch, Seq("text_md5"), "full_outer")
          .select(col("text_md5"),
            coalesce(col("n_emitted"), lit(0L)).as("n_emitted"),
            (coalesce(col("n_emitted"), lit(0L)) === 1L &&
              coalesce(col("in_batch"), lit(false))).as("parity"))
          .localCheckpoint(eager = false)
        // fail LOUD at any scale (round 13): an un-graded run (the
        // bench times sf0.1/sf1 where no DuckDB compare happens) must
        // not silently time broken semantics
        val broken = cmp.filter(!col("parity")).count()
        require(broken == 0L,
          s"stream_parity: $broken texts broke stream/batch parity " +
            "(state loss double-emitted a re-arrival, or a watermark " +
            "dropped rows as late)")
        cmp
        }
      },
      """SELECT DISTINCT md5(coalesce(text, '')) AS text_md5,
        |  CAST(1 AS BIGINT) AS n_emitted, TRUE AS parity
        |FROM documents""".stripMargin),

    // Second oracle-certified streaming path (round 12): where
    // stream_parity grades dropDuplicatesWithinWatermark by a
    // COMPARISON frame, this row goes further — the streamed output
    // ITSELF is hash-checked. The fn runs a bounded 4-micro-batch
    // stream (doc_id RANGE chunks, so ids stay arrival-monotone per
    // source — the budgetGate contract) through the custom
    // flatMapGroupsWithState operator (per-source token-budget
    // admission), and the greedy-prefix verdicts it emits are EXACTLY
    // one SQL window cumsum: DuckDB re-derives every (cum_weight,
    // selected) pair from documents alone. Any cross-batch state loss
    // (budget resets → later chunks re-admitted), double-charge on
    // replay, or intra-batch ordering slip breaks the hash.
    "stream_budget_gate" -> QueryDef.phased(
      (s, dir) => {
        import graft.streaming.StreamingCuration
        import s.implicits._
        val docs = Tables.documents(s, dir)
          .filter(col("doc_id").isNotNull && col("source").isNotNull &&
            col("n_chars").isNotNull)
          .select(col("source"), col("doc_id").cast("long"),
            col("n_chars").cast("long").as("weight"))
        val base = Scratch.dir("stream-budget")
        val landing = s"$base/in"
        // RANGE chunks (not mod): per-source doc_id must be monotone
        // ACROSS micro-batches — the gate checks it loudly since r12
        val stats = docs.agg(max(col("doc_id")), count(lit(1))).head()
        val maxId = stats.getLong(0)
        val nRows = stats.getLong(1)
        val cut = maxId / 4 + 1
        (0 until 4).foreach { i =>
          docs.filter(col("doc_id") >= i * cut &&
              col("doc_id") < (i + 1) * cut)
            .coalesce(1).write.mode("overwrite").json(s"$landing/c$i")
        }
        () => graft.streaming.StreamTuning.withStatePartitions(s, nRows) {
        val in = s.readStream
          .schema("source STRING, doc_id LONG, weight LONG")
          .option("maxFilesPerTrigger", "1").json(s"$landing/*")
          .as[StreamingCuration.BudgetDoc]
        val outDir = s"$base/out"
        val q = StreamingCuration.budgetGate(s, in, budget = 4000L)
          .toDF()
          .writeStream.option("checkpointLocation", s"$base/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, id: Long) =>
            b.write.mode("overwrite").parquet(s"$outDir/batch=$id")
          }
          .start()
        q.awaitTermination()
        s.read.parquet(outDir)
          .select(col("source"), col("doc_id"), col("weight"),
            col("cum_weight"), col("selected"))
        }
      },
      """SELECT source, doc_id, CAST(n_chars AS BIGINT) AS weight,
        |  CAST(sum(n_chars) OVER w AS BIGINT) AS cum_weight,
        |  CAST(sum(n_chars) OVER w AS BIGINT) <= 4000 AS selected
        |FROM documents
        |WHERE doc_id IS NOT NULL AND source IS NOT NULL
        |  AND n_chars IS NOT NULL
        |WINDOW w AS (PARTITION BY source ORDER BY doc_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin),

    // Third oracle-certified streaming path (round 12): WINDOWED
    // AGGREGATION state — with stream_parity (built-in dedup state) and
    // stream_budget_gate (custom keyed state) this completes registry
    // certification of the three stateful-operator families the
    // streaming layer uses. The fn streams the events table as 4
    // event-time-ordered range chunks through the f15 tumbling-day
    // aggregation under a watermark (append mode — a window row is
    // emitted exactly once, when the watermark passes its end), then
    // keeps the CLOSED days (window_start strictly before the max
    // event's day — the final day's window never closes on a bounded
    // stream and is excluded on BOTH sides). Day windows span chunk
    // boundaries, so window state genuinely merges across micro-
    // batches; the oracle is the same GROUP BY the batch f15 row pins.
    "stream_windowed_agg" -> QueryDef.phased(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("ts").isNotNull)
          // events.ts is TIMESTAMP_NTZ; under the UTC session the cast
          // to TIMESTAMP is wall-clock-identical, and micros transport
          // through JSON exactly (no format/zone parsing on re-read)
          .select(unix_micros(col("ts").cast("timestamp")).as("ts_us"),
            col("event_type"), col("value"))
        val base = Scratch.dir("stream-window")
        val landing = s"$base/in"
        val bounds = ev.agg(min(col("ts_us")), max(col("ts_us")),
          count(lit(1))).head()
        val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
        val nRows = bounds.getLong(2)
        val cut = (hi - lo) / 4 + 1
        (0 until 4).foreach { i =>
          ev.filter(col("ts_us") >= lo + i * cut &&
              col("ts_us") < lo + (i + 1) * cut)
            .coalesce(1).write.mode("overwrite").json(s"$landing/c$i")
        }
        () => graft.streaming.StreamTuning.withStatePartitions(s, nRows) {
        val in = s.readStream
          .schema("ts_us LONG, event_type STRING, value DOUBLE")
          .option("maxFilesPerTrigger", "1").json(s"$landing/*")
          .withColumn("ts", timestamp_micros(col("ts_us")))
          .withWatermark("ts", "0 seconds")
        val agg = in
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            coalesce(sum(expr("CAST(round(value * 1e6) AS BIGINT)")),
              lit(0L)).as("value_micro"))
          .select(col("window.start").as("window_start"),
            col("window.end").as("window_end"),
            col("event_type"), col("n"), col("value_micro"))
        val outDir = s"$base/out"
        val q = agg.writeStream
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, id: Long) =>
            b.write.mode("overwrite").parquet(s"$outDir/batch=$id")
          }
          .start()
        q.awaitTermination()
        s.read.parquet(outDir)
          .filter(col("window_start") <
            to_timestamp(date_trunc("DAY", timestamp_micros(lit(hi)))))
          // back to NTZ (wall-clock-identical under UTC): the batch f15
          // twin and the DuckDB oracle both speak naive timestamps
          .select(col("window_start").cast("timestamp_ntz").as("window_start"),
            col("window_end").cast("timestamp_ntz").as("window_end"),
            col("event_type"), col("n"), col("value_micro"))
        }
      },
      """SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
        |  time_bucket(INTERVAL '1 day', ts) + INTERVAL 1 DAY AS window_end,
        |  event_type, count(*) AS n,
        |  CAST(coalesce(sum(CAST(round(value * 1e6) AS BIGINT)), 0) AS BIGINT)
        |    AS value_micro
        |FROM events
        |WHERE ts IS NOT NULL
        |  AND time_bucket(INTERVAL '1 day', ts) <
        |    (SELECT time_bucket(INTERVAL '1 day', max(ts)) FROM events)
        |GROUP BY 1, 2, 3""".stripMargin),

    // Fourth oracle-certified streaming path (round 13): SESSION-WINDOW
    // state — the one stateful family stream_windowed_agg (fixed
    // tumbling grid) does not cover, because session state MERGES:
    // a session's extent is data-dependent, and an event arriving in a
    // later micro-batch can extend (and re-key) a session opened two
    // batches earlier. The fn streams events as 4 event-time range
    // chunks through StreamingAnalytics.sessionCounts (the SAME
    // session_window expression the batch w8 row pins) under a 0s
    // watermark in append mode, then keeps — on BOTH sides — only
    // sessions that end strictly before the final watermark (max event
    // ts): the last open session per user never closes on a bounded
    // stream. The oracle re-derives the identical sessions from first
    // principles (lag → µs-exact gap threshold → cumsum session ids).
    // A merge failure (a session split at a chunk boundary) changes
    // n_events AND both endpoints — any such break is a hash mismatch.
    "stream_session_window" -> QueryDef.phased(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("ts").isNotNull && col("user_id").isNotNull)
          .select(unix_micros(col("ts").cast("timestamp")).as("ts_us"),
            col("user_id"))
        val base = Scratch.dir("stream-session")
        val landing = s"$base/in"
        val bounds = ev.agg(min(col("ts_us")), max(col("ts_us")),
          count(lit(1))).head()
        val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
        val nRows = bounds.getLong(2)
        val cut = (hi - lo) / 4 + 1
        (0 until 4).foreach { i =>
          ev.filter(col("ts_us") >= lo + i * cut &&
              col("ts_us") < lo + (i + 1) * cut)
            .coalesce(1).write.mode("overwrite").json(s"$landing/c$i")
        }
        () => graft.streaming.StreamTuning.withStatePartitions(s, nRows) {
        val in = s.readStream
          .schema("ts_us LONG, user_id LONG")
          .option("maxFilesPerTrigger", "1").json(s"$landing/*")
          .withColumn("ts", timestamp_micros(col("ts_us")))
          .withWatermark("ts", "0 seconds")
        val sess = graft.streaming.StreamingAnalytics.sessionCounts(
          in, "ts", "user_id", "30 minutes")
        val outDir = s"$base/out"
        val q = sess.writeStream
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, id: Long) =>
            b.write.mode("overwrite").parquet(s"$outDir/batch=$id")
          }
          .start()
        q.awaitTermination()
        s.read.parquet(outDir)
          // strictly-closed sessions only, SAME filter the oracle
          // applies — robust to either strictness of the append-mode
          // emission boundary (an end == hi session is dropped on both
          // sides whether or not the engine emitted it)
          .filter(col("session_end") < timestamp_micros(lit(hi)))
          .select(col("user_id"),
            col("session_start").cast("timestamp_ntz").as("session_start"),
            col("session_end").cast("timestamp_ntz").as("session_end"),
            col("n_events"))
        }
      },
      """WITH e AS (
        |  SELECT user_id, ts FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN prev IS NULL
        |           OR epoch_us(ts) - epoch_us(prev) >= 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM (SELECT user_id, ts,
        |          lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |        FROM e)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g),
        |agg AS (
        |  SELECT user_id, min(ts) AS session_start,
        |    max(ts) + INTERVAL 30 MINUTE AS session_end,
        |    count(*) AS n_events
        |  FROM sess GROUP BY user_id, sid)
        |SELECT user_id, session_start, session_end, n_events
        |FROM agg
        |WHERE session_end < (SELECT max(ts) FROM e)""".stripMargin),

    // Fifth oracle-certified streaming path (round 13): STREAM-STREAM
    // INTERVAL JOIN state — the last stateful-operator family
    // (aggregation, dedup, flatMapGroupsWithState, session windows are
    // covered above). Two independent file streams — clicks and
    // purchases, each in 3 event-time range chunks — join on user_id
    // with purchase_ts ∈ [click_ts − 1 day, click_ts] through
    // StreamingAnalytics.intervalJoin. Watermark delay exceeds the full
    // event-time span, so NO buffered row is evicted before its match
    // can arrive: the streamed result must equal the batch interval
    // join EXACTLY, which DuckDB re-derives as a plain self-join of
    // events. Cross-batch buffering is genuinely exercised — a click in
    // chunk 2 must find purchases buffered from chunks 0-1 (and vice
    // versa: the sides' chunk clocks advance independently). Any state
    // loss drops pairs; any double-emission on replay adds them.
    "stream_interval_join" -> QueryDef.phased(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("ts").isNotNull)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("ts_us"),
            col("event_type"))
        val base = Scratch.dir("stream-ijoin")
        var nRows = 0L
        def chunks(side: DataFrame, name: String): String = {
          val landing = s"$base/$name"
          val b = side.agg(min(col("ts_us")), max(col("ts_us")),
            count(lit(1))).head()
          val (lo, hi) = (b.getLong(0), b.getLong(1))
          nRows += b.getLong(2)
          val cut = (hi - lo) / 3 + 1
          (0 until 3).foreach { i =>
            side.filter(col("ts_us") >= lo + i * cut &&
                col("ts_us") < lo + (i + 1) * cut)
              .coalesce(1).write.mode("overwrite").json(s"$landing/c$i")
          }
          landing
        }
        val clicksDir = chunks(
          ev.filter(col("event_type") === "click")
            .select(col("user_id"), col("event_id").as("click_id"),
              col("ts_us")), "clicks")
        val purchDir = chunks(
          ev.filter(col("event_type") === "purchase")
            .select(col("user_id").as("user_id_r"),
              col("event_id").as("purchase_id"), col("ts_us")), "purch")
        () => graft.streaming.StreamTuning.withStatePartitions(s, nRows) {
        val left = s.readStream
          .schema("user_id LONG, click_id LONG, ts_us LONG")
          .option("maxFilesPerTrigger", "1").json(s"$clicksDir/*")
          .withColumn("click_ts", timestamp_micros(col("ts_us")))
          .withWatermark("click_ts", "40 days")
        val right = s.readStream
          .schema("user_id_r LONG, purchase_id LONG, ts_us LONG")
          .option("maxFilesPerTrigger", "1").json(s"$purchDir/*")
          .withColumn("purchase_ts", timestamp_micros(col("ts_us")))
          .withWatermark("purchase_ts", "40 days")
        val joined = graft.streaming.StreamingAnalytics.intervalJoin(
          left, right, key = "user_id",
          leftTs = "click_ts", rightTs = "purchase_ts", within = "1 day")
        val outDir = s"$base/out"
        val q = joined
          .select(col("user_id"), col("click_id"), col("purchase_id"))
          .writeStream.option("checkpointLocation", s"$base/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, id: Long) =>
            b.write.mode("overwrite").parquet(s"$outDir/batch=$id")
          }
          .start()
        q.awaitTermination()
        s.read.parquet(outDir)
          .select(col("user_id"), col("click_id"), col("purchase_id"))
        }
      },
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
        |FROM events c JOIN events p
        |  ON p.user_id = c.user_id
        | AND p.ts BETWEEN c.ts - INTERVAL 1 DAY AND c.ts
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND c.ts IS NOT NULL AND p.ts IS NOT NULL""".stripMargin),

    // Sixth oracle-certified streaming path (round 13): the
    // mapGroupsWithState LATEST-PER-GROUP operator (streaming W6 — the
    // reference's live-forecast semantics, MySQL Data Push Scripts/
    // main.py:161-166's ON DUPLICATE KEY UPDATE done as keyed state).
    // Input is pre-deduplicated to one row per (user, event_type, ts)
    // keeping the max event_id — the batch w6 tiebreak — so the fold's
    // tie-overwrite branch can't make intra-batch arrival order
    // observable; chunks are event-time RANGES, satisfying the
    // operator's in-order-feed contract across batches. The final
    // emission per group (row_number over batch id) must carry the
    // group's true latest (ts, value) AND the full accumulated count n
    // — a state loss resets n, a dropped batch loses groups, both break
    // the hash. The oracle re-derives latest + count per group from
    // events alone.
    "stream_latest_per_group" -> QueryDef.phased(
      (s, dir) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("event_type"), col("ts"))
          .orderBy(col("event_id").desc)
        val ded = Tables.events(s, dir)
          .filter(col("ts").isNotNull && col("user_id").isNotNull &&
            col("event_type").isNotNull)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .select(col("user_id").cast("string").as("currency"),
            col("event_type").as("event"),
            unix_micros(col("ts").cast("timestamp")).as("ts_us"),
            col("value"))
        val base = Scratch.dir("stream-latest")
        val landing = s"$base/in"
        val bounds = ded.agg(min(col("ts_us")), max(col("ts_us")),
          count(lit(1))).head()
        val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
        val nRows = bounds.getLong(2)
        val cut = (hi - lo) / 4 + 1
        (0 until 4).foreach { i =>
          ded.filter(col("ts_us") >= lo + i * cut &&
              col("ts_us") < lo + (i + 1) * cut)
            .coalesce(1).write.mode("overwrite").json(s"$landing/c$i")
        }
        () => graft.streaming.StreamTuning.withStatePartitions(s, nRows) {
        val in = s.readStream
          .schema("currency STRING, event STRING, ts_us LONG, value DOUBLE")
          .option("maxFilesPerTrigger", "1").json(s"$landing/*")
          .select(col("currency"), col("event"),
            timestamp_micros(col("ts_us")).cast("timestamp")
              .as("eventTime"),
            col("value").as("actual"))
          .as[graft.streaming.StreamingAnalytics.EventRow]
        val outDir = s"$base/out"
        val q = graft.streaming.StreamingAnalytics.runningLatest(s, in)
          .toDF()
          .writeStream.option("checkpointLocation", s"$base/ckpt")
          .outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, id: Long) =>
            b.withColumn("batch_id", lit(id))
              .write.mode("overwrite").parquet(s"$outDir/batch=$id")
          }
          .start()
        q.awaitTermination()
        val lastW = org.apache.spark.sql.expressions.Window
          .partitionBy(col("currency"), col("event"))
          .orderBy(col("batch_id").desc)
        s.read.parquet(outDir)
          .withColumn("__rn", row_number().over(lastW))
          .filter(col("__rn") === 1)
          .select(col("currency").cast("long").as("user_id"),
            col("event").as("event_type"),
            col("latestTime").cast("timestamp_ntz").as("latest_ts"),
            col("latestValue").as("latest_value"),
            col("n"))
        }
      },
      """WITH ded AS (
        |  SELECT user_id, event_type, ts, value,
        |    row_number() OVER (PARTITION BY user_id, event_type, ts
        |                       ORDER BY event_id DESC) AS rn
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL),
        |d AS (SELECT user_id, event_type, ts, value FROM ded WHERE rn = 1),
        |r AS (
        |  SELECT user_id, event_type, ts, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts DESC) AS rn2,
        |    count(*) OVER (PARTITION BY user_id, event_type) AS n
        |  FROM d)
        |SELECT user_id, event_type, ts AS latest_ts, value AS latest_value, n
        |FROM r WHERE rn2 = 1""".stripMargin),

    // Seventh oracle-certified streaming path (round 13): the
    // flatMapGroupsWithState TRUNCATED-EWMA operator — per-key RING
    // state (last maxLag−1 values), the family where state is a
    // fixed-size value buffer rather than a single record
    // (stream_latest_per_group) or a running counter
    // (stream_budget_gate). The fn streams events as 4 event-time range
    // chunks (the operator's in-order-feed contract) through
    // StreamingAnalytics.streamingEwma, whose quantized BIGINT
    // arithmetic is the batch W13 chain VERBATIM — so the streamed EWMA
    // of every row must equal the batch operator's bit for bit, and the
    // oracle is the SAME quantized-weights SQL the batch w13_ewma row
    // pins. Ring-state corruption at any chunk boundary (lost tail,
    // wrong order) shifts a smoothed value and breaks the hash.
    "stream_ewma" -> QueryDef.phased(
      (s, dir) => {
        import s.implicits._
        // user_id/event_type null filters (matching stream_cusum): the
        // concat_ws key codec SKIPS a NULL component, which would merge a
        // null-keyed partition into its neighbor and diverge from the
        // oracle's NULL-respecting grouping. The fixture's event_type
        // vocabulary is '|'-free (enumerated types), so the delimited key
        // round-trips exactly for every surviving row.
        val ev = Tables.events(s, dir)
          .filter(col("value").isNotNull && col("ts").isNotNull &&
            col("user_id").isNotNull && col("event_type").isNotNull)
          .select(
            concat_ws("|", col("user_id"), col("event_type")).as("key"),
            unix_micros(col("ts").cast("timestamp")).as("ts"),
            col("event_id").as("id"), col("value").as("v"))
        val base = Scratch.dir("stream-ewma")
        val landing = s"$base/in"
        val bounds = ev.agg(min(col("ts")), max(col("ts")),
          count(lit(1))).head()
        val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
        val nRows = bounds.getLong(2)
        val cut = (hi - lo) / 4 + 1
        (0 until 4).foreach { i =>
          ev.filter(col("ts") >= lo + i * cut &&
              col("ts") < lo + (i + 1) * cut)
            .coalesce(1).write.mode("overwrite").json(s"$landing/c$i")
        }
        () => graft.streaming.StreamTuning.withStatePartitions(s, nRows) {
        val in = s.readStream
          .schema("key STRING, ts LONG, id LONG, v DOUBLE")
          .option("maxFilesPerTrigger", "1").json(s"$landing/*")
          .as[graft.streaming.StreamingAnalytics.EwmaEvent]
        val outDir = s"$base/out"
        val q = graft.streaming.StreamingAnalytics
          .streamingEwma(s, in, alpha = 0.3, maxLag = 8)
          .toDF()
          .writeStream.option("checkpointLocation", s"$base/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, id: Long) =>
            b.write.mode("overwrite").parquet(s"$outDir/batch=$id")
          }
          .start()
        q.awaitTermination()
        s.read.parquet(outDir)
          .select(col("id").as("event_id"),
            split(col("key"), "\\|").getItem(0).cast("long").as("user_id"),
            split(col("key"), "\\|").getItem(1).as("event_type"),
            col("v").as("value"), col("ewma"))
        }
      }, {
        val wvals = graft.operators.Features.ewmaWeights(0.3, 8).zipWithIndex
          .map { case (wt, j) => s"($j, CAST(${"%.17g".format(wt)} AS DOUBLE))" }
          .mkString(", ")
        s"""WITH r AS (
           |  SELECT event_id, user_id, event_type, value,
           |    row_number() OVER (PARTITION BY user_id, event_type
           |      ORDER BY ts, event_id) AS rn
           |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
           |    AND user_id IS NOT NULL AND event_type IS NOT NULL),
           |j AS (
           |  SELECT cur.event_id, cur.user_id, cur.event_type, cur.value,
           |    CAST(round(hist.value * w.wt * 1e12) AS BIGINT) AS tq,
           |    CAST(round(w.wt * 1e12) AS BIGINT) AS wq
           |  FROM r cur
           |  JOIN r hist ON cur.user_id = hist.user_id
           |    AND cur.event_type = hist.event_type
           |    AND hist.rn BETWEEN cur.rn - 7 AND cur.rn
           |  JOIN (VALUES $wvals) AS w(j, wt) ON w.j = cur.rn - hist.rn)
           |SELECT event_id, user_id, event_type, value,
           |  CAST(sum(tq) AS DOUBLE) / CAST(sum(wq) AS DOUBLE) AS ewma
           |FROM j GROUP BY 1, 2, 3, 4""".stripMargin
      }),

    // Eighth oracle-certified streaming path (round 13): the per-user
    // FUNNEL-PROGRESS operator (EV1 streaming) — mapGroupsWithState
    // whose state is a (stage, position) cursor advanced by the strict
    // (ts, event_id) order the batch funnel uses. Events stream as 4
    // event-time range chunks (in-order feed), so the greedy
    // first-completion semantics match the batch operator exactly; the
    // final per-user stage (emissions are monotone — max over batches)
    // must equal the batch funnel's reach, which the oracle re-derives
    // user by user with the ev1 stage chain. A cursor lost at a chunk
    // boundary repeats or skips a stage and breaks the hash.
    "stream_funnel" -> QueryDef.phased(
      (s, dir) => {
        import s.implicits._
        val stages = Seq("signup", "view", "click", "purchase")
        val ev = Tables.events(s, dir)
          .filter(col("ts").isNotNull && col("user_id").isNotNull &&
            col("event_type").isin(stages: _*))
          .select(col("user_id").as("userId"), col("event_type").as("eventType"),
            unix_micros(col("ts").cast("timestamp")).as("ts_us"),
            col("event_id").as("eventId"))
        val base = Scratch.dir("stream-funnel")
        val landing = s"$base/in"
        val bounds = ev.agg(min(col("ts_us")), max(col("ts_us")),
          count(lit(1))).head()
        val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
        val nRows = bounds.getLong(2)
        val cut = (hi - lo) / 4 + 1
        (0 until 4).foreach { i =>
          ev.filter(col("ts_us") >= lo + i * cut &&
              col("ts_us") < lo + (i + 1) * cut)
            .coalesce(1).write.mode("overwrite").json(s"$landing/c$i")
        }
        () => graft.streaming.StreamTuning.withStatePartitions(s, nRows) {
        val in = s.readStream
          .schema("userId LONG, eventType STRING, ts_us LONG, eventId LONG")
          .option("maxFilesPerTrigger", "1").json(s"$landing/*")
          .select(col("userId"), col("eventType"),
            timestamp_micros(col("ts_us")).cast("timestamp").as("eventTime"),
            col("eventId"))
          .as[graft.streaming.StreamingAnalytics.FunnelEvent]
        val outDir = s"$base/out"
        val q = graft.streaming.StreamingAnalytics
          .funnelProgress(s, in, stages)
          .toDF()
          .writeStream.option("checkpointLocation", s"$base/ckpt")
          .outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, id: Long) =>
            b.write.mode("overwrite").parquet(s"$outDir/batch=$id")
          }
          .start()
        q.awaitTermination()
        // reach is monotone per user — the final stage is the max emission
        s.read.parquet(outDir)
          .groupBy(col("userId").as("user_id"))
          .agg(max(col("stage")).cast("int").as("stage"))
          .select(col("user_id"), col("stage"))
        }
      },
      """WITH base AS (
        |  SELECT user_id, event_type, ts, event_id FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IN ('signup', 'view', 'click', 'purchase')),
        |s1 AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT user_id, ts, event_id,
        |      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |    FROM base WHERE event_type = 'signup') WHERE rn = 1),
        |s2 AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT e.user_id, e.ts, e.event_id,
        |      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
        |    FROM base e JOIN s1 ON e.user_id = s1.user_id
        |    WHERE e.event_type = 'view'
        |      AND (e.ts, e.event_id) > (s1.ts, s1.event_id)) WHERE rn = 1),
        |s3 AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT e.user_id, e.ts, e.event_id,
        |      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
        |    FROM base e JOIN s2 ON e.user_id = s2.user_id
        |    WHERE e.event_type = 'click'
        |      AND (e.ts, e.event_id) > (s2.ts, s2.event_id)) WHERE rn = 1),
        |s4 AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT e.user_id, e.ts, e.event_id,
        |      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
        |    FROM base e JOIN s3 ON e.user_id = s3.user_id
        |    WHERE e.event_type = 'purchase'
        |      AND (e.ts, e.event_id) > (s3.ts, s3.event_id)) WHERE rn = 1)
        |SELECT u.user_id,
        |  CAST(CASE WHEN s4.user_id IS NOT NULL THEN 4
        |            WHEN s3.user_id IS NOT NULL THEN 3
        |            WHEN s2.user_id IS NOT NULL THEN 2
        |            WHEN s1.user_id IS NOT NULL THEN 1
        |            ELSE 0 END AS INT) AS stage
        |FROM (SELECT DISTINCT user_id FROM base) u
        |LEFT JOIN s1 ON u.user_id = s1.user_id
        |LEFT JOIN s2 ON u.user_id = s2.user_id
        |LEFT JOIN s3 ON u.user_id = s3.user_id
        |LEFT JOIN s4 ON u.user_id = s4.user_id""".stripMargin),

    // Ninth oracle-certified streaming path (round 13): the LEDGERED
    // ADDITIVE sketch merge — counter addition is NOT idempotent, so
    // runCountMin's exactly-once recipe (cell-wise add under a one-row
    // batch-id high-water ledger, published via versioned snapshot) is
    // precisely the machinery a replay would corrupt. The fn streams
    // events as 4 chunks through runCountMin, then REDELIVERS two
    // already-applied batches straight into the merge step (the
    // checkpoint-recovery shape) — both must be provable no-ops — and
    // emits the artifact's cells. The oracle re-derives the EXACT
    // count-min cells from events alone (the batch sketch_count_min md5
    // chain): one double-counted cell from a replay, one lost cell from
    // a dropped batch, or a wrong high-water mark breaks the hash.
    "stream_count_min" -> QueryDef.phased(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"))
        val base = Scratch.dir("stream-cms")
        val landing = s"$base/in"
        val nRows = ev.count()
        // additive counters are order-insensitive — mod chunks suffice
        (0 until 4).foreach { i =>
          ev.filter(pmod(col("event_id"), lit(4)) === i)
            .coalesce(1).write.mode("overwrite").json(s"$landing/c$i")
        }
        () => graft.streaming.StreamTuning.withStatePartitions(s, nRows) {
        val in = s.readStream
          .schema("event_id LONG, user_id LONG")
          .option("maxFilesPerTrigger", "1").json(s"$landing/*")
        val artifact = s"$base/artifact"
        val q = graft.streaming.StreamingAnalytics.runCountMin(
          s, in, keyCol = "user_id", width = 64, depth = 4, seed = "cms8",
          artifactDir = artifact, checkpointDir = s"$base/ckpt")
        q.awaitTermination()
        // REDELIVERY of already-applied batches (first and latest) — the
        // ledger must make both exact no-ops
        val replay = ev.filter(pmod(col("event_id"), lit(4)) === 0)
        graft.streaming.StreamingAnalytics.applyCountMinBatch(
          s, replay, batchId = 0L, keyCol = "user_id", width = 64,
          depth = 4, seed = "cms8", artifactDir = artifact)
        graft.streaming.StreamingAnalytics.applyCountMinBatch(
          s, replay, batchId = 3L, keyCol = "user_id", width = 64,
          depth = 4, seed = "cms8", artifactDir = artifact)
        val snap = graft.operators.Sinks.readSnapshot(s, artifact)
        val maxApplied = snap.filter(col("batch_id") >= 0)
          .agg(max(col("batch_id"))).head().getLong(0)
        require(maxApplied == 3L,
          s"stream_count_min: ledger high-water $maxApplied != 3 — a " +
            "redelivered batch advanced (or a live batch missed) the ledger")
        snap.filter(col("batch_id") < 0)
          .select(col("sk_row"), col("sk_col"), col("c"),
            lit(maxApplied).as("max_applied"))
        }
      },
      """WITH cells AS (
        |  SELECT user_id, i.i AS sk_row,
        |    CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR) || ':' ||
        |      CAST(user_id AS VARCHAR) || ':cms8'), 1, 15)) AS BIGINT) % 64
        |      AS sk_col
        |  FROM events, LATERAL unnest(generate_series(0, 3)) AS i(i)
        |  WHERE user_id IS NOT NULL)
        |SELECT CAST(sk_row AS INT) AS sk_row, sk_col,
        |  count(*) AS c, CAST(3 AS BIGINT) AS max_applied
        |FROM cells GROUP BY 1, 2""".stripMargin),

    // Tenth oracle-certified streaming path (round 13): the IDEMPOTENT-
    // BY-ALGEBRA sketch merge — bloom bit-set union, the contrast case
    // to stream_count_min's ledger (OR-ing bits already present is a
    // no-op, so replay safety needs NO bookkeeping). The fn streams the
    // member keys as 4 chunks through runBloomMembership, REDELIVERS a
    // chunk's bloom into the published artifact (must not change one
    // bit), then serves the full membership probe frame off the
    // artifact — hash-compared against the batch sketch_bloom md5
    // chain. A lost chunk flips might_contain rows (no false negatives
    // ever — one_sided_ok is the one-sided contract as data).
    "stream_bloom_membership" -> QueryDef.phased(
      (s, dir) => {
        import graft.operators.{Sinks, Sketches}
        val ev = Tables.events(s, dir)
        val members = ev.filter(pmod(col("user_id"), lit(7)) === 0)
          .select(col("event_id"), col("user_id"))
        val base = Scratch.dir("stream-bloom")
        val landing = s"$base/in"
        val nRows = members.count()
        (0 until 4).foreach { i =>
          members.filter(pmod(col("event_id"), lit(4)) === i)
            .coalesce(1).write.mode("overwrite").json(s"$landing/c$i")
        }
        () => graft.streaming.StreamTuning.withStatePartitions(s, nRows) {
        val in = s.readStream
          .schema("event_id LONG, user_id LONG")
          .option("maxFilesPerTrigger", "1").json(s"$landing/*")
        val artifact = s"$base/artifact"
        val q = graft.streaming.StreamingAnalytics.runBloomMembership(
          s, in, keyCol = "user_id", bits = 128, hashes = 3, seed = "bl9",
          artifactDir = artifact, checkpointDir = s"$base/ckpt")
        q.awaitTermination()
        val snap = Sinks.readSnapshot(s, artifact).select(col("bit"))
          .localCheckpoint(eager = false)
        // algebraic replay: re-unioning chunk 0's bloom must be a no-op
        val replayBits = Sketches.bloom(
          members.filter(pmod(col("event_id"), lit(4)) === 0),
          col("user_id"), bits = 128, hashes = 3, seed = "bl9")
        val replayed = Sketches.mergeBlooms(Seq(snap, replayBits))
        val drift = snap.withColumn("__a", lit(1))
          .join(replayed.withColumn("__b", lit(1)), Seq("bit"), "full_outer")
          .filter(col("__a").isNull || col("__b").isNull).count()
        require(drift == 0L,
          s"stream_bloom_membership: replaying a chunk changed $drift " +
            "bits — the union stopped being idempotent")
        Sketches.bloomMightContain(snap, ev, col("user_id"),
          bits = 128, hashes = 3, seed = "bl9")
          .withColumnRenamed("key", "user_id")
          .withColumn("truly_in", pmod(col("user_id"), lit(7)) === 0)
          .select(col("user_id"), col("might_contain"), col("truly_in"),
            (!col("truly_in") || col("might_contain")).as("one_sided_ok"),
            lit(true).as("replay_noop_ok"))
        }
      },
      """WITH members AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE user_id IS NOT NULL AND user_id % 7 = 0),
        |bits AS (
        |  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR)
        |    || ':' || CAST(user_id AS VARCHAR) || ':bl9'), 1, 15))
        |    AS BIGINT) % 128 AS bit
        |  FROM members, LATERAL unnest(generate_series(0, 2)) AS i(i)),
        |probes AS (
        |  SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
        |pb AS (
        |  SELECT user_id, CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR)
        |    || ':' || CAST(user_id AS VARCHAR) || ':bl9'), 1, 15))
        |    AS BIGINT) % 128 AS bit
        |  FROM probes, LATERAL unnest(generate_series(0, 2)) AS i(i)),
        |mc AS (
        |  SELECT p.user_id, count(b.bit) = 3 AS might_contain
        |  FROM pb p LEFT JOIN bits b USING (bit) GROUP BY p.user_id)
        |SELECT user_id, might_contain, user_id % 7 = 0 AS truly_in,
        |  (NOT user_id % 7 = 0) OR might_contain AS one_sided_ok,
        |  TRUE AS replay_noop_ok
        |FROM mc""".stripMargin),

    // Eleventh oracle-certified streaming path (round 13): the
    // PER-BATCH DISTRIBUTION MONITOR — runDriftMonitor grades every
    // micro-batch's value distribution against a FIXED reference
    // histogram by exact integer cross-multiplied TVD (the batch a36
    // arithmetic), writing one verdict frame per batch. The fn fits the
    // reference grid over ALL events (Sketches.binHistogram — the
    // shared-grid mergeability contract), streams events as 4
    // event_id-mod-4 chunks, and emits every batch's verdicts. The
    // oracle re-derives the ENTIRE per-batch grading from events alone
    // (batch composition IS event_id % 4): grid, bins, per-batch
    // counts, integer TVD, threshold verdict — a monitor that binned
    // one value off-grid or graded against a drifted reference breaks
    // the hash.
    "stream_drift" -> QueryDef.phased(
      (s, dir) => {
        import graft.operators.Sketches
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
        val base = Scratch.dir("stream-drift")
        val refDir = s"$base/ref"
        Sketches.binHistogram(ev, Seq("event_type"), col("value"),
          nBins = 10)
          .write.mode("overwrite").parquet(refDir)
        val landing = s"$base/in"
        val nRows = ev.count()
        (0 until 4).foreach { i =>
          ev.filter(pmod(col("event_id"), lit(4)) === i)
            .coalesce(1).write.mode("overwrite").json(s"$landing/c$i")
        }
        () => graft.streaming.StreamTuning.withStatePartitions(s, nRows) {
        val in = s.readStream
          .schema("event_id LONG, event_type STRING, value DOUBLE")
          .option("maxFilesPerTrigger", "1").json(s"$landing/*")
        val outDir = s"$base/out"
        val q = graft.streaming.StreamingAnalytics.runDriftMonitor(
          s, in, group = Seq("event_type"), valueCol = "value", nBins = 10,
          refDir = refDir, outDir = outDir, checkpointDir = s"$base/ckpt",
          thresholdMilli = 100L, runId = "r0")
        q.awaitTermination()
        s.read.parquet(outDir)
          .select(col("event_type"), col("batch_id"), col("n_ref"),
            col("n_batch"), col("tvd"), col("drifted"))
        }
      },
      """WITH b AS (
        |  SELECT event_type, value, event_id % 4 AS batch_id
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |g AS (
        |  SELECT event_type, min(value) AS lo, max(value) AS hi
        |  FROM b GROUP BY 1),
        |c AS (
        |  SELECT b.event_type, b.batch_id,
        |    least(greatest(CAST(floor((b.value - g.lo) /
        |      (CASE WHEN g.hi = g.lo THEN 1.0
        |            ELSE (g.hi - g.lo) / 10.0 END)) AS BIGINT), 0), 9)
        |      AS bin
        |  FROM b JOIN g USING (event_type)),
        |ref AS (
        |  SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n1
        |  FROM c GROUP BY 1, 2),
        |bat AS (
        |  SELECT event_type, batch_id, bin, CAST(count(*) AS BIGINT) AS n2
        |  FROM c GROUP BY 1, 2, 3),
        |pairs AS (SELECT DISTINCT event_type, batch_id FROM b),
        |j AS (
        |  SELECT p.event_type, p.batch_id, r.bin, r.n1,
        |    coalesce(bt.n2, 0) AS n2
        |  FROM pairs p JOIN ref r USING (event_type)
        |  LEFT JOIN bat bt ON bt.event_type = p.event_type
        |    AND bt.batch_id = p.batch_id AND bt.bin = r.bin),
        |tt AS (
        |  SELECT event_type, batch_id,
        |    CAST(sum(n1) AS BIGINT) AS t1, CAST(sum(n2) AS BIGINT) AS t2
        |  FROM j GROUP BY 1, 2),
        |sg AS (
        |  SELECT j.event_type, j.batch_id,
        |    CAST(sum(abs(j.n1 * tt.t2 - j.n2 * tt.t1)) AS BIGINT) AS s,
        |    max(tt.t1) AS n_ref, max(tt.t2) AS n_batch
        |  FROM j JOIN tt USING (event_type, batch_id)
        |  GROUP BY 1, 2)
        |SELECT event_type, batch_id, n_ref, n_batch,
        |  CAST(s AS DOUBLE) / (2.0 * CAST(n_ref AS DOUBLE)
        |    * CAST(n_batch AS DOUBLE)) AS tvd,
        |  s * 1000 >= 200 * n_ref * n_batch AS drifted
        |FROM sg WHERE n_batch > 0""".stripMargin),

    // Twelfth oracle-certified streaming path (round 13): ONLINE CUSUM
    // change detection (Page 1954's sequential form) — per-key state is
    // TWO exact BIGINT micro-unit counters with an alarm-reset
    // recursion, the one state shape no window rewrite can express; the
    // oracle re-derives EVERY per-event statistic with a DuckDB
    // RECURSIVE CTE running the identical integer recursion (values
    // quantized by the same round-half-away-from-zero rule on both
    // engines, so each comparison is exact integers and the recursion
    // is bit-deterministic). Events stream as 4 event-time range chunks
    // (the in-order-feed contract); a counter lost or double-stepped at
    // any chunk boundary shifts every downstream statistic of that key
    // and breaks the hash. Constants: target 50, slack 5, threshold 80
    // (events.value spans ~0–490, so both sides fire real alarms and
    // the post-alarm reset path is genuinely exercised).
    "stream_cusum" -> QueryDef.phased(
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .filter(col("value").isNotNull && col("ts").isNotNull &&
            col("user_id").isNotNull && col("event_type").isNotNull)
          .select(
            concat_ws("|", col("user_id"), col("event_type")).as("key"),
            unix_micros(col("ts").cast("timestamp")).as("ts"),
            col("event_id").as("id"), col("value").as("v"))
        val base = Scratch.dir("stream-cusum")
        val landing = s"$base/in"
        val bounds = ev.agg(min(col("ts")), max(col("ts")),
          count(lit(1))).head()
        val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
        val nRows = bounds.getLong(2)
        val cut = (hi - lo) / 4 + 1
        (0 until 4).foreach { i =>
          ev.filter(col("ts") >= lo + i * cut &&
              col("ts") < lo + (i + 1) * cut)
            .coalesce(1).write.mode("overwrite").json(s"$landing/c$i")
        }
        () => graft.streaming.StreamTuning.withStatePartitions(s, nRows) {
        val in = s.readStream
          .schema("key STRING, ts LONG, id LONG, v DOUBLE")
          .option("maxFilesPerTrigger", "1").json(s"$landing/*")
          .as[graft.streaming.StreamingAnalytics.CusumEvent]
        val outDir = s"$base/out"
        val q = graft.streaming.StreamingAnalytics
          .streamingCusum(s, in, target = 50.0, slack = 5.0,
            threshold = 80.0)
          .toDF()
          .writeStream.option("checkpointLocation", s"$base/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, id: Long) =>
            b.write.mode("overwrite").parquet(s"$outDir/batch=$id")
          }
          .start()
        q.awaitTermination()
        s.read.parquet(outDir)
          .select(col("id").as("event_id"),
            split(col("key"), "\\|").getItem(0).cast("long").as("user_id"),
            split(col("key"), "\\|").getItem(1).as("event_type"),
            col("v").as("value"), col("sPlus").as("s_plus"),
            col("sMinus").as("s_minus"), col("alarm"))
        }
      },
      """WITH RECURSIVE r AS (
        |  SELECT user_id, event_type, event_id, value,
        |    CAST(round(value * 1e6) AS BIGINT) AS vm,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS rn
        |  FROM events
        |  WHERE value IS NOT NULL AND ts IS NOT NULL
        |    AND user_id IS NOT NULL AND event_type IS NOT NULL),
        |c AS (
        |  SELECT user_id, event_type, event_id, value, rn,
        |    greatest(CAST(0 AS BIGINT), vm - 55000000) AS sp,
        |    greatest(CAST(0 AS BIGINT), 45000000 - vm) AS sm
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.user_id, r.event_type, r.event_id, r.value, r.rn,
        |    greatest(CAST(0 AS BIGINT),
        |      (CASE WHEN c.sp > 80000000 OR c.sm > 80000000
        |            THEN 0 ELSE c.sp END) + (r.vm - 55000000)),
        |    greatest(CAST(0 AS BIGINT),
        |      (CASE WHEN c.sp > 80000000 OR c.sm > 80000000
        |            THEN 0 ELSE c.sm END) + (45000000 - r.vm))
        |  FROM c JOIN r ON r.user_id = c.user_id
        |    AND r.event_type = c.event_type AND r.rn = c.rn + 1)
        |SELECT event_id, user_id, event_type, value,
        |  CAST(sp AS DOUBLE) / 1e6 AS s_plus,
        |  CAST(sm AS DOUBLE) / 1e6 AS s_minus,
        |  sp > 80000000 OR sm > 80000000 AS alarm
        |FROM c""".stripMargin),

    // Thirteenth oracle-certified streaming path (round 13): the
    // LEDGERED FIXED-GRID HISTOGRAM — with stream_count_min (additive +
    // ledger) and stream_bloom_membership (idempotent union) this puts
    // the whole mergeable-sketch maintenance discipline under the gate.
    // The grid ((lo, width) per group) is fitted ONCE in batch and
    // NEVER moves while the stream runs (the shared-grid mergeability
    // contract); each micro-batch bins against it and adds cell-wise
    // under the one-row high-water ledger. The fn streams events as 4
    // chunks, REDELIVERS two already-applied batches into the merge
    // step (both must be exact no-ops), and emits the artifact's cells
    // — grid doubles included, which are IEEE-identical cross-engine
    // (min, and (hi−lo)/32 — one subtraction, one division).
    "stream_hist" -> QueryDef.phased(
      (s, dir) => {
        import graft.operators.{Sinks, Sketches}
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
        val base = Scratch.dir("stream-hist")
        val gridDir = s"$base/grid"
        Sketches.histBounds(ev, Seq("event_type"), col("value"), nBins = 32)
          .write.mode("overwrite").parquet(gridDir)
        val landing = s"$base/in"
        val nRows = ev.count()
        (0 until 4).foreach { i =>
          ev.filter(pmod(col("event_id"), lit(4)) === i)
            .coalesce(1).write.mode("overwrite").json(s"$landing/c$i")
        }
        () => graft.streaming.StreamTuning.withStatePartitions(s, nRows) {
        val in = s.readStream
          .schema("event_id LONG, event_type STRING, value DOUBLE")
          .option("maxFilesPerTrigger", "1").json(s"$landing/*")
        val artifact = s"$base/artifact"
        val q = graft.streaming.StreamingAnalytics.runBinHistogram(
          s, in, group = Seq("event_type"), valueCol = "value", nBins = 32,
          gridDir = gridDir, artifactDir = artifact,
          checkpointDir = s"$base/ckpt")
        q.awaitTermination()
        // redeliver two already-applied batches — exact no-ops or bust
        val replay = ev.filter(pmod(col("event_id"), lit(4)) === 1)
        graft.streaming.StreamingAnalytics.applyHistBatch(
          s, replay, batchId = 1L, group = Seq("event_type"),
          valueCol = "value", nBins = 32, gridDir = gridDir,
          artifactDir = artifact)
        graft.streaming.StreamingAnalytics.applyHistBatch(
          s, replay, batchId = 3L, group = Seq("event_type"),
          valueCol = "value", nBins = 32, gridDir = gridDir,
          artifactDir = artifact)
        val snap = Sinks.readSnapshot(s, artifact)
        val maxApplied = snap.filter(col("batch_id") >= 0)
          .agg(max(col("batch_id"))).head().getLong(0)
        require(maxApplied == 3L,
          s"stream_hist: ledger high-water $maxApplied != 3 — a " +
            "redelivered batch advanced (or a live batch missed) the ledger")
        snap.filter(col("batch_id") < 0)
          .select(col("event_type"), col("bin"), col("lo"), col("width"),
            col("cnt"), lit(maxApplied).as("max_applied"))
        }
      },
      """WITH b AS (
        |  SELECT event_type, min(value) AS lo, max(value) AS hi
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |bw AS (
        |  SELECT event_type, lo,
        |    CASE WHEN hi = lo THEN 1.0 ELSE (hi - lo) / 32.0 END AS width
        |  FROM b)
        |SELECT e.event_type,
        |  least(greatest(CAST(floor((e.value - bw.lo) / bw.width)
        |    AS BIGINT), 0), 31) AS bin,
        |  bw.lo AS lo, bw.width AS width, count(*) AS cnt,
        |  CAST(3 AS BIGINT) AS max_applied
        |FROM events e JOIN bw USING (event_type)
        |WHERE e.value IS NOT NULL
        |GROUP BY 1, 2, 3, 4""".stripMargin),

    // Fourteenth oracle-certified streaming path (round 13): the
    // streaming HLL distinct counter — the one sketch whose VALUE a
    // foreign engine cannot re-derive (Apache DataSketches registers),
    // so the row pins the logisticFit-style invariants as data instead:
    // the running estimate lands within ±5% of the exact distinct count
    // (DuckDB recomputes the truth), and re-unioning an already-
    // absorbed chunk leaves the estimate EXACTLY unchanged (HLL union
    // is idempotent by algebra — per-register max — which is why this
    // sink needs no ledger). State is one ~2.5 KB sketch row forever.
    "stream_hll_distinct" -> QueryDef.phased(
      (s, dir) => {
        import graft.operators.Sinks
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"))
        val base = Scratch.dir("stream-hll")
        val landing = s"$base/in"
        val nRows = ev.count()
        (0 until 4).foreach { i =>
          ev.filter(pmod(col("event_id"), lit(4)) === i)
            .coalesce(1).write.mode("overwrite").json(s"$landing/c$i")
        }
        () => graft.streaming.StreamTuning.withStatePartitions(s, nRows) {
        val in = s.readStream
          .schema("event_id LONG, user_id LONG")
          .option("maxFilesPerTrigger", "1").json(s"$landing/*")
        val artifact = s"$base/artifact"
        val q = graft.streaming.StreamingAnalytics.runHllDistinct(
          s, in, keyCol = "user_id", artifactDir = artifact,
          checkpointDir = s"$base/ckpt")
        q.awaitTermination()
        val snap = Sinks.readSnapshot(s, artifact)
          .select(col("sk"), col("estimate"))
          .localCheckpoint(eager = false)
        // algebraic replay: re-union chunk 0 — the estimate must not
        // move by one ulp (identical registers → identical estimate)
        val chunk0 = ev.filter(pmod(col("event_id"), lit(4)) === 0)
          .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
        val replayed = snap.select(col("sk")).unionByName(chunk0)
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est2"))
        snap.crossJoin(replayed)
          .crossJoin(ev.agg(
            count_distinct(col("user_id")).as("n_exact")))
          .select(col("n_exact"),
            (abs(col("estimate") - col("n_exact")) <=
              lit(0.05) * col("n_exact")).as("est_ok"),
            (col("estimate") === col("est2")).as("replay_noop_ok"))
        }
      },
      """SELECT count(DISTINCT user_id) AS n_exact,
        |  TRUE AS est_ok, TRUE AS replay_noop_ok
        |FROM events""".stripMargin),

    // Fifteenth oracle-certified streaming path (round 13): the
    // streaming CDC SINK — an I/U/D changelog stream maintaining a
    // bucketed keyed snapshot (runChangesToBucketedSnapshot, the
    // Debezium-consumer shape). Four micro-batches: the initial INSERT
    // image, an UPDATE/DELETE wave, a re-INSERT wave for the deleted
    // keys, then a VERBATIM REPLAY of the re-insert wave (the
    // at-least-once delivery shape — the per-key latest-op collapse
    // must absorb it without drift). The final snapshot is hash-
    // compared against the batch snk10 oracle's relational collapse —
    // a lost delete, a stale update, or a replay-induced duplicate all
    // break the hash.
    "stream_cdc_apply" -> QueryDef.phased(
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        val base = Scratch.dir("stream-cdc")
        val landing = s"$base/in"
        val existing = e.filter(col("event_id") % 3 === 0)
          .withColumn("op", lit("I")).withColumn("ord", lit(0L))
        val upsDels = e.filter(col("event_id") % 5 === 0)
          .withColumn("value", col("value") + 1)
          .withColumn("op",
            when(col("event_id") % 10 === 0, "D").otherwise("U"))
          .withColumn("ord", lit(1L))
        val reins = e.filter(col("event_id") % 10 === 0)
          .withColumn("value", col("value") * 2)
          .withColumn("op", lit("I"))
          .withColumn("ord", lit(2L))
        val nRows = e.count()
        Seq(existing, upsDels, reins, reins).zipWithIndex.foreach {
          case (chunk, i) => chunk.coalesce(1).write.mode("overwrite")
            .json(s"$landing/c$i")
        }
        () => graft.streaming.StreamTuning.withStatePartitions(s, nRows) {
        val in = s.readStream
          .schema("event_id LONG, user_id LONG, event_type STRING, " +
            "value DOUBLE, op STRING, ord LONG")
          .option("maxFilesPerTrigger", "1").json(s"$landing/*")
        val tableDir = s"$base/table"
        val q = graft.streaming.StreamingIngest
          .runChangesToBucketedSnapshot(in, tableDir, s"$base/ckpt",
            key = Seq("event_id"), orderCol = "ord", nBuckets = 16)
        q.awaitTermination()
        graft.operators.Sinks.readBucketedSnapshot(s, tableDir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        }
      },
      """WITH existing AS (
        |  SELECT event_id, user_id, event_type, value FROM events
        |  WHERE event_id % 3 = 0),
        |changes AS (
        |  SELECT event_id, user_id, event_type, value + 1 AS value,
        |    CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op,
        |    CAST(1 AS BIGINT) AS ord
        |  FROM events WHERE event_id % 5 = 0
        |  UNION ALL
        |  SELECT event_id, user_id, event_type, value * 2, 'I',
        |    CAST(2 AS BIGINT)
        |  FROM events WHERE event_id % 10 = 0),
        |latest AS (
        |  SELECT * FROM changes
        |  QUALIFY row_number()
        |    OVER (PARTITION BY event_id ORDER BY ord DESC, op DESC) = 1)
        |SELECT e.event_id, e.user_id, e.event_type, e.value FROM existing e
        |WHERE e.event_id NOT IN (SELECT event_id FROM latest)
        |UNION ALL
        |SELECT event_id, user_id, event_type, value
        |FROM latest WHERE op <> 'D'""".stripMargin),

    // Sixteenth oracle-certified streaming path (round 13): the
    // streaming KEYED-UPSERT SINK (SNK1's scale face on an unbounded
    // stream) — runToBucketedSnapshot maintains the queryable latest-
    // per-key snapshot at O(touched buckets) per trigger. Events stream
    // as 4 event-time range chunks (pre-deduplicated to one row per
    // (key, ts) keeping max event_id — the w6 tiebreak, so last-write-
    // wins is deterministic), and the FINAL snapshot must be the true
    // latest row per (user, event_type) — which the oracle re-derives
    // directly. A bucket that lost an upsert, applied one out of order,
    // or duplicated a key breaks the hash.
    "stream_upsert_snapshot" -> QueryDef.phased(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("event_type"), col("ts"))
          .orderBy(col("event_id").desc)
        val ded = Tables.events(s, dir)
          .filter(col("ts").isNotNull && col("user_id").isNotNull &&
            col("event_type").isNotNull)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts").cast("timestamp")).as("ts_us"),
            col("value"))
        val base = Scratch.dir("stream-upsert")
        val landing = s"$base/in"
        val bounds = ded.agg(min(col("ts_us")), max(col("ts_us")),
          count(lit(1))).head()
        val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
        val nRows = bounds.getLong(2)
        val cut = (hi - lo) / 4 + 1
        (0 until 4).foreach { i =>
          ded.filter(col("ts_us") >= lo + i * cut &&
              col("ts_us") < lo + (i + 1) * cut)
            .coalesce(1).write.mode("overwrite").json(s"$landing/c$i")
        }
        () => graft.streaming.StreamTuning.withStatePartitions(s, nRows) {
        val in = s.readStream
          .schema("user_id LONG, event_type STRING, ts_us LONG, value DOUBLE")
          .option("maxFilesPerTrigger", "1").json(s"$landing/*")
        val tableDir = s"$base/table"
        val q = graft.streaming.StreamingIngest.runToBucketedSnapshot(
          in, tableDir, s"$base/ckpt",
          key = Seq("user_id", "event_type"), orderCol = "ts_us",
          nBuckets = 16)
        q.awaitTermination()
        graft.operators.Sinks.readBucketedSnapshot(s, tableDir)
          .select(col("user_id"), col("event_type"),
            timestamp_micros(col("ts_us")).cast("timestamp_ntz")
              .as("latest_ts"),
            col("value").as("latest_value"))
        }
      },
      """WITH ded AS (
        |  SELECT user_id, event_type, ts, value,
        |    row_number() OVER (PARTITION BY user_id, event_type, ts
        |                       ORDER BY event_id DESC) AS rn
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL),
        |d AS (SELECT user_id, event_type, ts, value FROM ded WHERE rn = 1),
        |r AS (
        |  SELECT user_id, event_type, ts, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts DESC) AS rn2
        |  FROM d)
        |SELECT user_id, event_type, ts AS latest_ts, value AS latest_value
        |FROM r WHERE rn2 = 1""".stripMargin),

    "ext_corpus_curation_v2" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val normed = UrlCuration.normalizeUrls(
          UrlCuration.synthesizeUrls(docs, urlSeed))
        val blk = normed.select(col("doc_id"), col("url_norm"), col("domain"))
          .withColumn("blocked",
            UrlCuration.blocklistVerdict(col("domain"), urlBlocklist))
        val ucanon = blk.filter(col("domain").isNotNull && !col("blocked"))
          .groupBy(col("url_norm")).agg(min(col("doc_id")).as("url_canon"))
        // LAZY checkpoints (Dedup convention): every stage frame feeds
        // both the next stage's filter and the final provenance join.
        val s1v = blk.join(ucanon, Seq("url_norm"), "left")
          .select(col("doc_id"),
            (col("domain").isNotNull && !col("blocked") &&
              col("doc_id") === col("url_canon")).as("url_kept"))
          .localCheckpoint(eager = false)
        val stage1 = docs
          .join(s1v.filter(col("url_kept")).select("doc_id"), "doc_id")
        val g = TextAnalysis.gopherRulesRowwise(stage1, gopherCorpusParams)
          .select(col("doc_id"), col("n_tokens"), col("gopher_pass"))
          .localCheckpoint(eager = false)
        val stage2 = stage1
          .join(g.filter(col("gopher_pass")).select("doc_id"), "doc_id")
        val ppl = TextAnalysis.lmPerplexity(stage2, vocabK = 150, lmK = 500,
          refFraction = 0.3, seed = "r11cv2", algo = "md5")
          .select(col("doc_id"), col("ppl_bucket"))
          .localCheckpoint(eager = false)
        val pri = g.join(
            ppl.filter(col("ppl_bucket").isin("head", "middle"))
              .select("doc_id"), "doc_id")
          .withColumn("lottery",
            graft.operators.Sampling.bucket(col("doc_id"), "r11cv2b", "md5"))
        val cut = graft.operators.Sampling.selectWithinBudget(pri,
          priority = col("lottery"), weight = col("n_tokens"),
          id = col("doc_id"), budget = cv2Budget)
          .select(col("doc_id"), col("selected"))
        docs.select("doc_id")
          .join(s1v, Seq("doc_id"), "left")
          .join(g.select("doc_id", "gopher_pass"), Seq("doc_id"), "left")
          .join(ppl, Seq("doc_id"), "left")
          .join(cut, Seq("doc_id"), "left")
          .select(col("doc_id"), col("url_kept"), col("gopher_pass"),
            col("ppl_bucket"), coalesce(col("selected"), lit(false))
              .as("selected"))
      },
      curationV2Oracle)
  )

  /** The composed-stack oracle for ext_corpus_curation_v2: the URL chain,
    * gopher rules, and the full perplexity chain are the SAME generators
    * as the standalone rows, re-pointed at each stage's survivor relation
    * (nested WITH subqueries — DuckDB scopes them correctly), plus the
    * budget window. One hash certifies the composition. */
  private lazy val cv2Budget = 4000L
  private lazy val curationV2Oracle: String = {
    val gp = gopherOracle(gopherCorpusParams, src = "stage1")
    val lm = lmPerplexityOracle(vocabK = 150, lmK = 500, refFraction = 0.3,
      seed = "r11cv2", src = "stage2")
    // the sub-oracles are spliced AFTER stripMargin — a line of theirs
    // beginning with '||' would otherwise lose a pipe to the margin strip
    duckUrlChain(urlSeed) + s""",
       |blk AS (
       |  SELECT doc_id, url_norm, domain,
       |    CASE WHEN domain IS NOT NULL THEN
       |      domain = 'd7.example.com' OR
       |      ends_with(domain, '.d7.example.com') OR
       |      domain = 'd13.example.com' OR
       |      ends_with(domain, '.d13.example.com') END AS blocked
       |  FROM nn),
       |ucanon AS (
       |  SELECT url_norm, min(doc_id) AS url_canon FROM blk
       |  WHERE domain IS NOT NULL AND NOT blocked GROUP BY 1),
       |s1v AS (
       |  SELECT b.doc_id,
       |    b.domain IS NOT NULL AND NOT b.blocked
       |      AND b.doc_id = u.url_canon AS url_kept
       |  FROM blk b LEFT JOIN ucanon u USING (url_norm)),
       |stage1 AS (
       |  SELECT d.doc_id, d.text FROM documents d
       |  JOIN s1v USING (doc_id) WHERE s1v.url_kept),
       |g AS (SELECT doc_id, n_tokens, gopher_pass FROM (__GP__)),
       |stage2 AS (
       |  SELECT s.doc_id, s.text FROM stage1 s JOIN g USING (doc_id)
       |  WHERE g.gopher_pass),
       |ppl AS (SELECT doc_id, ppl_bucket FROM (__LM__)),
       |pri AS (
       |  SELECT g.doc_id, g.n_tokens,
       |    CAST(('0x' || substr(md5(CAST(g.doc_id AS VARCHAR)
       |      || ':r11cv2b'), 1, 15)) AS BIGINT) % 1000000 AS lottery
       |  FROM g JOIN ppl USING (doc_id)
       |  WHERE ppl.ppl_bucket IN ('head', 'middle')),
       |bud AS (
       |  SELECT doc_id,
       |    CAST(sum(n_tokens) OVER (ORDER BY lottery DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) <= $cv2Budget AS selected
       |  FROM pri)
       |SELECT d.doc_id, s1v.url_kept, g.gopher_pass, ppl.ppl_bucket,
       |  coalesce(bud.selected, false) AS selected
       |FROM documents d
       |LEFT JOIN s1v USING (doc_id)
       |LEFT JOIN g USING (doc_id)
       |LEFT JOIN ppl USING (doc_id)
       |LEFT JOIN bud USING (doc_id)""".stripMargin
        .replace("__GP__", gp).replace("__LM__", lm)
  }

  /** Shared by the three ext_url_* registrations. */
  private lazy val urlSeed = "r11u"
  private lazy val urlCapSeed = "r11cap"
  private lazy val urlCap = 8
  private lazy val urlBlocklist = Seq("d7.example.com", "d13.example.com")

  /** Shared by both ext_gopher_rules registrations — one parameter set,
    * one oracle string, two Spark plans. */
  private lazy val gopherCorpusParams = TextAnalysis.GopherParams(
    minTokens = 50L, maxTokens = 100000L,
    minMeanLenMilli = 4200L, maxMeanLenMilli = 10000L,
    minAlphaPerMille = 800L, maxSymbolPerMille = 100L,
    minStopwords = 2L, maxTopTokenPerMille = 125L,
    stopwords = Seq("the", "a", "of", "fast", "slow", "be", "and", "with"))

  // lazy: referenced from the eagerly-built `defs` map literal above —
  // a strict val here would still be null at that point
  private lazy val dsirTargetSources = Seq("src0", "src1", "src2", "src3")
}
