package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Test-set decontamination for the LLM-data-pipeline extension surface:
  * flag training-corpus documents that share word n-grams with a held-out
  * benchmark set (the standard leakage check run before every pretraining
  * job — n around 13 in practice; overlap means the eval answer may
  * literally appear in the training data).
  *
  * Scale design (100 TB): the corpus is the huge side, the benchmark is
  * small by definition (eval sets are MBs). So the benchmark collapses to
  * ONE row holding the sorted union of its distinct n-gram hashes, gets
  * broadcast, and every corpus document counts its overlap with the
  * allocation-free two-pointer native
  * [[graft.functions.SortedIntersectCount]] — the corpus side is a pure
  * map pass over the scan: no shuffle, no explosion of corpus n-grams
  * into the exchange, no join state proportional to the corpus
  * (DecontaminationSpec pins the shuffle-free probe plan). Memory bound =
  * the benchmark's distinct-gram array must fit in a broadcast, the same
  * budget as any broadcast join build side.
  *
  * Hashing follows the [[Dedup.hashedShingles]] convention: `algo="xxh64"`
  * (production) or `"md5"` (the differential-testing parameterization an
  * external engine can re-derive bit-for-bit — the registered
  * `ext_decontaminate` row runs md5 against a DuckDB oracle, and
  * `ext_decontaminate_prod` pins that the two hash choices flag the same
  * documents). Gram-hash collisions can only ADD a phantom shared gram at
  * the 2⁻⁶⁰ rate — sharpen with `minShared > 1` if that matters.
  */
object Decontamination {

  // Working names overwritten internally; OUTPUT holds the appended
  // result columns. Both sets are guarded against caller collisions —
  // silently clobbering a caller's `contaminated` (e.g. re-checking an
  // already-annotated corpus against a second benchmark) must fail loud.
  private val Working = Seq("ws", "gh", "bench_hs")
  private val Output = Seq("n_grams", "n_shared", "contaminated")

  // NULL text reads as the empty document (zero grams, never
  // contaminated, row preserved) — without the coalesce, split(NULL)
  // would flow NULL through size() (-1 under legacy sizeOfNull) and the
  // null-intolerant intersect, emitting (n_grams=-1, contaminated=NULL).
  private def withGrams(df: DataFrame, n: Int, algo: String): DataFrame = df
    .withColumn("ws", Dedup.tokens(coalesce(col("text"), lit(""))))
    .withColumn("gh", Dedup.hashedShingles("ws", n, algo))

  /** The benchmark collapsed to its broadcast form: ONE row holding the
    * sorted union of all distinct gram hashes (`bench_hs`). Build it once
    * and reuse — [[graft.streaming.StreamingCuration.decontaminationGate]]
    * caches this frame so a long-running stream doesn't re-tokenize and
    * re-aggregate the benchmark on every micro-batch.
    *
    * The gram CONTRACT (n, algo) is embedded in the column's metadata and
    * read back by [[annotateAgainst]] — the AsOfJoin pack/probe
    * convention: a probe can never silently re-hash with a different n or
    * algo than the pack was built with (a mismatch would intersect
    * disjoint hash spaces and read every document as clean — the silent
    * false-negative direction for a leakage gate).
    *
    * collect_set keeps the array element type non-null, which the native
    * intersect requires; sort_array restores the two-pointer precondition
    * the per-doc arrays already satisfy. */
  def benchmarkGrams(benchmark: DataFrame, n: Int,
                     algo: String = "xxh64"): DataFrame = {
    graft.functions.GraftFunctions.register(benchmark.sparkSession)
    val contract = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft_gram_n", n.toLong)
      .putString("graft_gram_algo", algo)
      .build()
    withGrams(benchmark, n, algo)
      .select(explode(col("gh")).as("h"))
      .agg(sort_array(collect_set(col("h"))).as("bench_hs"))
      .select(col("bench_hs").as("bench_hs", contract))
  }

  /** [[annotate]] against a pre-built [[benchmarkGrams]] frame — the form
    * to use when the benchmark is checked repeatedly (streams, several
    * corpora). The gram parameters (n, algo) are READ FROM THE PACK's
    * column metadata — there is nothing to re-specify, so the corpus side
    * is hashed with exactly the contract the benchmark was built under. */
  def annotateAgainst(corpus: DataFrame, benchGrams: DataFrame,
                      minShared: Int = 1): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(benchGrams.columns.contains("bench_hs"),
      "benchGrams must come from Decontamination.benchmarkGrams (missing bench_hs)")
    val md = benchGrams.schema("bench_hs").metadata
    require(md.contains("graft_gram_n") && md.contains("graft_gram_algo"),
      "benchGrams must come from Decontamination.benchmarkGrams " +
        "(bench_hs carries no gram contract metadata)")
    val n = md.getLong("graft_gram_n").toInt
    val algo = md.getString("graft_gram_algo")
    val reservedHits = (Working ++ Output).filter(corpus.columns.contains)
    require(reservedHits.isEmpty,
      s"reserved column names $reservedHits in the corpus frame")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    withGrams(corpus, n, algo)
      .crossJoin(broadcast(benchGrams))
      .withColumn("n_grams", size(col("gh")).cast("long"))
      .withColumn("n_shared", call_function("graft_sorted_intersect_count",
        col("gh"), col("bench_hs")))
      .withColumn("contaminated", col("n_shared") >= minShared)
      .drop(Working: _*)
  }

  /** The annotating form: every corpus column preserved, plus `n_grams`,
    * `n_shared`, and `contaminated` (`n_shared` = DISTINCT word `n`-grams
    * of the document appearing anywhere in the benchmark; `contaminated =
    * n_shared >= minShared`). Documents shorter than `n` tokens have zero
    * grams and are never contaminated; NULL text reads as the empty
    * document. Corpus columns named `ws`/`gh`/`bench_hs` or any of the
    * output names are rejected (they would be overwritten).
    *
    * Because the corpus side is one stateless projection plus a
    * broadcast join against a STATIC benchmark, this same code runs
    * unchanged on an unbounded streaming frame (stream-static join) —
    * [[graft.streaming.StreamingCuration.decontaminationGate]] composes
    * it into the streaming curation flow. */
  def annotate(corpus: DataFrame, benchmark: DataFrame, n: Int,
               minShared: Int = 1, algo: String = "xxh64"): DataFrame =
    annotateAgainst(corpus, benchmarkGrams(benchmark, n, algo), minShared)

  /** The reporting form: `(doc_id, n_grams, n_shared, contaminated)` only
    * — the registered-query surface. Both frames must carry
    * (doc_id, text). */
  def flag(corpus: DataFrame, benchmark: DataFrame, n: Int,
           minShared: Int = 1, algo: String = "xxh64"): DataFrame =
    annotate(corpus, benchmark, n, minShared, algo)
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        col("contaminated"))
}
