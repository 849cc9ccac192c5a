package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Sampling, TextAnalysis}

/** Deterministic sampling over the documents corpus (engine extension —
  * the subset/split/mixture machinery of a training-data pipeline; see
  * Sampling's scaladoc for why rand()-based `df.sample` can't do this).
  *
  * All rows run the md5 bucket (`algo = "md5"`, the Dedup.hashedShingles
  * convention) so DuckDB re-derives the EXACT sample membership:
  * `CAST(('0x' || substr(md5(key || ':' || seed), 1, 15)) AS BIGINT)`
  * equals Spark's `conv(substring(md5(..), 1, 15), 16, 10)` — both read
  * the same 60-bit prefix of the same digest. Production uses the
  * codegen'd xxh64 path; SamplingSpec pins that both algos realize the
  * requested fraction and every invariant below holds for both.
  */
object SamplingQueries {

  /** DuckDB side of Sampling.bucket(algo = "md5"). */
  private def duckBucket(key: String, seed: String): String =
    s"CAST(('0x' || substr(md5(CAST($key AS VARCHAR) || ':$seed'), 1, 15)) AS BIGINT) % 1000000"

  val defs: Map[String, QueryDef] = Map(

    // Deterministic epoch shuffle (round 11) — reproducible global
    // training order as a pure function of (doc_id, epoch seed). Two
    // epochs ranked in ONE output so the oracle certifies both the
    // order (explicit rank columns — the sorted row-compare would
    // otherwise never see it) and cross-epoch independence as data.
    "ext_epoch_shuffle" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e1 = Sampling.epochShuffle(
          Tables.documents(s, dir).select(col("doc_id")),
          col("doc_id"), "epoch1", algo = "md5")
          .withColumnRenamed("shuffle_key", "key_e1")
        val e2 = Sampling.epochShuffle(e1, col("doc_id"), "epoch2",
          algo = "md5")
          .withColumnRenamed("shuffle_key", "key_e2")
        e2.withColumn("rank_e1", row_number().over(
            Window.orderBy(col("key_e1"), col("doc_id"))).cast("long"))
          .withColumn("rank_e2", row_number().over(
            Window.orderBy(col("key_e2"), col("doc_id"))).cast("long"))
      },
      s"""WITH h AS (
         |  SELECT doc_id,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':epoch1'),
         |      1, 15)) AS BIGINT) AS key_e1,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':epoch2'),
         |      1, 15)) AS BIGINT) AS key_e2
         |  FROM documents)
         |SELECT doc_id, key_e1, key_e2,
         |  row_number() OVER (ORDER BY key_e1, doc_id) AS rank_e1,
         |  row_number() OVER (ORDER BY key_e2, doc_id) AS rank_e2
         |FROM h""".stripMargin),

    // Token-budget corpus cut (round 11) — greedy prefix under a total
    // weight budget in (priority DESC, doc_id) order; priority here is
    // the seeded md5 lottery (caller-supplied in general — quality
    // scores compose identically). cum_weight + selected are exported
    // as data so the oracle re-derives the exact budget boundary: the
    // crossing row and everything after it is out, no backfill.
    "ext_budget_select" -> QueryDef(
      (s, dir) => Sampling.selectWithinBudget(
        Tables.documents(s, dir)
          .select(col("doc_id"),
            size(split(coalesce(col("text"), lit("")), " "))
              .cast("long").as("n_tokens"))
          .withColumn("lottery",
            Sampling.bucket(col("doc_id"), "budget1", "md5")),
        priority = col("lottery"), weight = col("n_tokens"),
        id = col("doc_id"), budget = 15000L),
      s"""WITH base AS (
         |  SELECT doc_id,
         |    len(string_split(coalesce(text, ''), ' ')) AS n_tokens,
         |    ${duckBucket("doc_id", "budget1")} AS lottery
         |  FROM documents)
         |SELECT doc_id, n_tokens, lottery,
         |  CAST(sum(n_tokens) OVER (ORDER BY lottery DESC, doc_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_weight,
         |  CAST(sum(n_tokens) OVER (ORDER BY lottery DESC, doc_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) <= 15000 AS selected
         |FROM base""".stripMargin),

    // Plain 30% corpus subsample, reproducible by doc_id.
    "ext_hash_sample" -> QueryDef(
      (s, dir) => Sampling.sample(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
        key = col("doc_id"), fraction = 0.3, seed = "r5", algo = "md5"),
      s"""SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE ${duckBucket("doc_id", "r5")} < 300000""".stripMargin),

    // EXACT-count quota: exactly 20 docs per language (fewer only when the
    // group is smaller), membership a pure function of (doc_id, seed) —
    // the hard-count sibling of the Bernoulli gates. Full 60-bit md5 rank
    // (not the bucketed %1e6) + doc_id tiebreak: a total order both
    // engines derive identically.
    "ext_sample_n_per_group" -> QueryDef(
      (s, dir) => Sampling.sampleNPerGroup(
        Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        groups = Seq("lang"), key = col("doc_id"), n = 20,
        seed = "r7q", algo = "md5"),
      """SELECT doc_id, lang FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang
        |  ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':r7q'),
        |                 1, 15)) AS BIGINT),
        |           CAST(doc_id AS VARCHAR)) <= 20""".stripMargin),

    // Stratified: downsample the over-represented language to rebalance
    // the mix (en keeps 25%, everything else 80%).
    "ext_stratified_sample" -> QueryDef(
      (s, dir) => Sampling.stratified(
        Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        key = col("doc_id"), strata = col("lang"),
        fractions = Map("en" -> 0.25), defaultFraction = 0.8,
        seed = "r5s", algo = "md5"),
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${duckBucket("doc_id", "r5s")} <
         |      CASE lang WHEN 'en' THEN 250000 ELSE 800000 END""".stripMargin),

    // Disjoint-and-exhaustive 80/10/10 split: every doc labeled exactly
    // once, labels stable forever (the test set can never leak).
    "ext_hash_split" -> QueryDef(
      (s, dir) => Sampling.hashSplit(
        Tables.documents(s, dir).select(col("doc_id"), col("source")),
        key = col("doc_id"),
        splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        labelCol = "split", seed = "r5v", algo = "md5"),
      s"""SELECT doc_id, source,
         |  CASE WHEN ${duckBucket("doc_id", "r5v")} < 800000 THEN 'train'
         |       WHEN ${duckBucket("doc_id", "r5v")} < 900000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin),

    // Weighted three-corpus training mixture with provenance tags; the
    // seed is salted per tag so per-corpus decisions are independent.
    "ext_corpus_mixture" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("source"))
        def corpus(lo: Int, hi: Int) = docs.where(
          col("source").isin((lo to hi).map(i => s"src$i"): _*))
        Sampling.mixture(
          Seq(("web", corpus(0, 6), 0.9),
            ("books", corpus(7, 13), 0.5),
            ("code", corpus(14, 19), 0.2)),
          key = col("doc_id"), tagCol = "mix_source", seed = "r5m",
          algo = "md5")
      },
      {
        def arm(tag: String, members: String, frac: Long): String =
          s"""SELECT doc_id, lang, source, '$tag' AS mix_source
             |FROM documents
             |WHERE source IN ($members)
             |  AND ${duckBucket("doc_id", s"r5m:$tag")} < $frac""".stripMargin
        Seq(
          arm("web", (0 to 6).map(i => s"'src$i'").mkString(", "), 900000L),
          arm("books", (7 to 13).map(i => s"'src$i'").mkString(", "), 500000L),
          arm("code", (14 to 19).map(i => s"'src$i'").mkString(", "), 200000L)
        ).mkString("\nUNION ALL\n")
      }),

    // K-fold cross-validation assignment: 5 disjoint exhaustive folds by
    // bucket mod k, exact membership re-derived by the oracle.
    "ext_kfold" -> QueryDef(
      (s, dir) => Sampling.kFold(
        Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        key = col("doc_id"), k = 5, foldCol = "fold", seed = "r6k",
        algo = "md5"),
      s"""SELECT doc_id, lang, ${duckBucket("doc_id", "r6k")} % 5 AS fold
         |FROM documents""".stripMargin),

    // Feature hashing: 64-bucket hashed bag-of-words — the
    // vocabulary-free sparse text vectorizer; per-(doc, bucket) counts
    // re-derived exactly by the oracle on the md5 path.
    "ext_hashed_bow" -> QueryDef(
      (s, dir) => TextAnalysis.hashedBagOfWords(
        Tables.documents(s, dir), buckets = 64, seed = "r6h", algo = "md5"),
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS token
         |  FROM documents)
         |SELECT doc_id, ${duckBucket("token", "r6h")} % 64 AS bucket,
         |  count(*) AS cnt
         |FROM tok GROUP BY 1, 2""".stripMargin),

    // Temperature-scaled (α = 0.5) domain rebalancing at a 20% output
    // budget: the oracle re-derives the per-domain counts, the
    // lexicographic-order √n fold (list_reduce over a sorted list — the
    // same left fold the driver runs), the keep-fractions, and exact md5
    // gate membership. sqrt is IEEE-correctly-rounded in both engines,
    // so the thresholds match bitwise.
    "ext_temperature_mixture" -> QueryDef(
      (s, dir) => Sampling.temperatureMixture(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("source")),
        key = col("doc_id"), domain = col("source"),
        targetFraction = 0.2, seed = "r6t", algo = "md5"),
      s"""WITH c AS (
         |  SELECT source AS dom, count(*) AS n FROM documents GROUP BY 1),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c),
         |ws AS (
         |  SELECT list_reduce(
         |    list_prepend(CAST(0.0 AS DOUBLE),
         |      list(sqrt(CAST(n AS DOUBLE)) ORDER BY dom)),
         |    (a, b) -> a + b) AS wsum
         |  FROM c),
         |f AS (
         |  SELECT dom,
         |    CAST(round(least(CAST(1.0 AS DOUBLE),
         |      (CAST(0.2 AS DOUBLE) * n_total)
         |        * (sqrt(CAST(n AS DOUBLE)) / wsum)
         |        / CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS thr
         |  FROM c, tot, ws)
         |SELECT d.doc_id, d.lang, d.source
         |FROM documents d JOIN f ON f.dom = d.source
         |WHERE ${duckBucket("d.doc_id", "r6t")} < f.thr""".stripMargin),

    // Weighted (PPS) sampling (round 9): inclusion probability
    // proportional to n_chars — the "sample long documents more" knob a
    // token-budgeted curation pass needs. Poisson-PPS: p = min(1,
    // k·w/W), gate = bucket(doc_id) < p·1e6 — W is ONE exact micro-unit
    // BIGINT sum (same quantization as the numerator, fractional-safe),
    // the gate is map-only, and every arithmetic step is a fixed IEEE
    // chain both engines replay bitwise (no pow — that's why the A-Res
    // exact-k sibling Sampling.weightedTopK is spec-pinned instead of
    // registered). Expected size 200; actual size is data-deterministic.
    "ext_weighted_sample" -> QueryDef(
      (s, dir) => Sampling.ppsSample(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("n_chars")),
        key = col("doc_id"), weight = col("n_chars"), k = 200,
        seed = "r9w", algo = "md5")
        .select(col("doc_id"), col("source"), col("n_chars"), col("p")),
      s"""WITH w AS (
         |  SELECT CAST(sum(CAST(round(CAST(n_chars AS DOUBLE) * 1e6)
         |    AS BIGINT)) AS DOUBLE) AS wt
         |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
         |SELECT doc_id, source, n_chars,
         |  least(CAST(1.0 AS DOUBLE),
         |    (CAST(200.0 AS DOUBLE) * CAST(round(CAST(n_chars AS DOUBLE)
         |      * 1e6) AS BIGINT)) / w.wt) AS p
         |FROM documents, w
         |WHERE n_chars IS NOT NULL AND n_chars > 0
         |  AND CAST(${duckBucket("doc_id", "r9w")} AS DOUBLE) <
         |    least(CAST(1.0 AS DOUBLE),
         |      (CAST(200.0 AS DOUBLE) * CAST(round(CAST(n_chars AS DOUBLE)
         |        * 1e6) AS BIGINT)) / w.wt) * 1000000""".stripMargin))
}
