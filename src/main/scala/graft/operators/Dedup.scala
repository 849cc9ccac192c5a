package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for the LLM-data-pipeline extension
  * surface: exact (see ExtensionQueries.dedup_exact), n-gram Jaccard
  * ground truth, MinHash+LSH, and SimHash.
  *
  * All hashing is Spark's built-in xxhash64 (codegen'd, no UDFs); shingles
  * are word n-grams (the test corpus has a ~31-word vocabulary, so word
  * SETS are non-discriminative but shingle sets separate cleanly: planted
  * near-dups at Jaccard ≥ 0.5 vs background ≤ 0.03).
  *
  * Scale design (100 TB):
  *  - the brute-force pair join ([[jaccardPairs]]) is the CORRECTNESS
  *    reference, O(n²) — run it only on samples/buckets.
  *  - the scale path is [[minhashLshPairs]]: per-doc signatures (one
  *    narrow projection), explode to `bands` rows/doc, shuffle on the
  *    16-byte band key, pair-generate within buckets only, then verify
  *    candidates exactly. Never all-pairs. Candidate volume is tuned by
  *    (numPerm, rowsPerBand): more rows/band → fewer false candidates,
  *    lower recall per band — with exact verification downstream,
  *    precision is always 1.0 and only recall is probabilistic.
  *  - SimHash is the cheaper alternative when a single 64-bit sketch per
  *    doc must be stored: near-dup ⇔ small Hamming distance; banding the
  *    64 bits into 4×16 guarantees candidate generation for distance ≤ 3
  *    (pigeonhole) and is probabilistic beyond.
  */
object Dedup {

  /** Whitespace tokens of `text`. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles over the token-array column named
    * `wsCol` (expr-based builders take column NAMES — a lambda-heavy
    * expression tree over a named column keeps the generated SQL legible). */
  def shingles(wsCol: String, n: Int): Column = {
    val grams = (0 until n).map(off => s"element_at($wsCol, CAST(i + $off AS INT))")
    // Guard the short-doc case explicitly: Spark's sequence(1, 0) yields a
    // DESCENDING [1, 0] (not an empty array), which would emit bogus
    // shingles for docs with fewer than n tokens.
    expr(
      s"""CASE WHEN size($wsCol) < $n THEN array()
         |ELSE array_distinct(transform(sequence(1, size($wsCol) - ${n - 1}),
         |  i -> concat_ws(' ', ${grams.mkString(", ")})))
         |END""".stripMargin)
  }

  /** Exact Jaccard condition `|A∩B| / |A∪B| ≥ num/den` in pure integer
    * arithmetic — no float boundary, identical in any engine. */
  def jaccardAtLeast(a: Column, b: Column, num: Int, den: Int): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(a) + size(b) - inter
    (inter * den) >= (union * num)
  }

  /** Ground-truth near-dup pairs by exact shingle Jaccard ≥ num/den.
    * O(n²) — correctness reference and small-scale path only. */
  def jaccardPairs(docs: DataFrame, n: Int, num: Int, den: Int): DataFrame = {
    val s = docs
      .withColumn("ws", tokens(col("text")))
      .select(col("doc_id"), shingles("ws", n).as("sh"))
    val a = s.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = s.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .filter(jaccardAtLeast(col("sh_a"), col("sh_b"), num, den))
      .select(col("doc_a"), col("doc_b"))
  }

  /** MinHash signature over the shingle-array column named `shCol`: for
    * permutation p, min over shingles of xxhash64(shingle, p). numPerm
    * independent 64-bit hash functions via the extra seed column — one
    * pass, codegen'd. */
  def minhashSignature(shCol: String, numPerm: Int): Column =
    expr(
      s"transform(sequence(0, ${numPerm - 1}), " +
        s"p -> array_min(transform($shCol, s -> xxhash64(s, p))))")

  /** LSH candidate pairs + exact verification.
    *
    * Signature → `numPerm/rowsPerBand` bands → explode → shuffle on the
    * (band_id, band_hash) key → in-bucket pair generation → distinct →
    * exact-Jaccard verify. Output = verified near-dup pairs (doc_a <
    * doc_b); precision 1.0, recall 1−(1−j^r)^b per pair. */
  def minhashLshPairs(docs: DataFrame, n: Int, numPerm: Int,
                      rowsPerBand: Int, num: Int, den: Int): DataFrame = {
    val numBands = numPerm / rowsPerBand
    val s = docs
      .withColumn("ws", tokens(col("text")))
      .withColumn("sh", shingles("ws", n))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"),
        minhashSignature("sh", numPerm).as("sig"))
    val banded = s.select(col("doc_id"), posexplode(expr(
      s"transform(sequence(0, ${numBands - 1}), " +
        s"b -> xxhash64(b, slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))"))
      .as(Seq("band_id", "band_hash")))
    // In-bucket pair generation: collect bucket members, emit ordered pairs.
    val candidates = banded
      .groupBy(col("band_id"), col("band_hash"))
      .agg(collect_set(col("doc_id")).as("members"))
      .filter(size(col("members")) > 1)
      .select(explode(expr(
        """flatten(transform(members,
          |  x -> transform(filter(members, y -> y > x),
          |       y -> struct(x AS doc_a, y AS doc_b))))""".stripMargin))
        .as("pair"))
      .select(col("pair.doc_a"), col("pair.doc_b"))
      .distinct()
    val sh = s.select(col("doc_id"), col("sh"))
    candidates
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .filter(jaccardAtLeast(col("sh_a"), col("sh_b"), num, den))
      .select(col("doc_a"), col("doc_b"))
  }

  /** 63-bit SimHash over the shingle-array column named `shCol` (bit 63
    * left clear so the value stays a non-negative BIGINT): bit b is set iff
    * the count of shingles with bit b set exceeds half. One pass over the
    * shingle array per bit — fine for sketching; at scale prefer computing
    * the 64 counters in one aggregate pass via a custom Expression if
    * profiling demands. */
  def simhash(shCol: String): Column =
    expr(
      s"""aggregate(
         |  transform(sequence(0, 62),
         |    b -> CASE WHEN aggregate($shCol, 0L,
         |           (acc, s) -> acc + CASE WHEN (shiftright(xxhash64(s), b) & 1) = 1
         |                                  THEN 1L ELSE -1L END) > 0
         |         THEN 1L ELSE 0L END),
         |  0L, (acc, bit) -> acc * 2 + bit)""".stripMargin)

  /** Per-doc SimHash sketch + its 4×16-bit band keys (for hamming-bucket
    * joins downstream). */
  def simhashSketch(docs: DataFrame, n: Int): DataFrame =
    docs
      .withColumn("ws", tokens(col("text")))
      .withColumn("sh", shingles("ws", n))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), simhash("sh").as("simhash"))
      .withColumn("band0", expr("simhash & 65535"))
      .withColumn("band1", expr("shiftright(simhash, 16) & 65535"))
      .withColumn("band2", expr("shiftright(simhash, 32) & 65535"))
      .withColumn("band3", expr("shiftright(simhash, 48) & 65535"))

  /** SimHash near-dup pairs: candidates share ≥1 of the 4 16-bit bands
    * (guaranteed for Hamming ≤ 3), confirmed by bit_count(xor) ≤ maxDist. */
  def simhashPairs(docs: DataFrame, n: Int, maxDist: Int): DataFrame = {
    val sk = simhashSketch(docs, n)
    val banded = sk.select(col("doc_id"), col("simhash"), posexplode(
      array(col("band0"), col("band1"), col("band2"), col("band3")))
      .as(Seq("band_id", "band_val")))
    val a = banded.select(col("band_id"), col("band_val"),
      col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band_id"), col("band_val"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("band_id", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(expr(s"bit_count(sim_a ^ sim_b) <= $maxDist"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }
}
