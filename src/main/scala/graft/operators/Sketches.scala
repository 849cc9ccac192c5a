package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches — the streaming/approximate counting
  * family next to the engine's exact aggregates (A9's histogram, the
  * a11/a12 approx-distinct/quantile rows).
  *
  * Count-min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary"): a depth×width integer counter matrix; every key
  * occurrence increments counter(i, hᵢ(key)) in each of the `depth` rows.
  * The point estimate min_i counter(i, hᵢ(k)) is ALWAYS ≥ the true count
  * (collisions only add) and exceeds it by more than 2N/width with
  * probability ≤ (1/2)^depth — the classic ε-δ guarantee with ε = 2/width,
  * δ = 2^−depth.
  *
  * Why it earns a place in a 100 TB engine: the exact per-key count is a
  * corpus-wide shuffle keyed by an unbounded-cardinality column, while
  * the sketch is a FIXED d·w-cell aggregate — the groupBy combines
  * map-side, so the shuffle carries at most d·w rows per partition no
  * matter how many distinct keys exist, the built sketch is kilobytes
  * (parquet-persistable, broadcastable, and MERGEABLE: sketches of two
  * corpora with the same (w, d, seed) add cell-wise), and serving an
  * estimate is a broadcast lookup. The trade is one-sided error, stated
  * in the estimate's contract.
  *
  * Hashing is the engine's md5 cross-engine convention (the
  * Sampling/Dedup gate): row i's column for a key is the 60-bit prefix
  * of md5("i:key:seed") mod width — any engine with md5 re-derives the
  * ENTIRE sketch bit-for-bit, which is what lets the DuckDB oracle
  * hash-match estimates instead of settling for invariant booleans.
  */
object Sketches {

  /** Column index of `key` in sketch row `i`. */
  private def cell(key: Column, i: Int, seed: String, width: Int): Column =
    conv(substring(md5(concat(lit(s"$i:"), key.cast("string"),
      lit(":" + seed))), 1, 15), 16, 10).cast("long") % width

  /** Build the sketch: one output row per non-empty (sk_row, sk_col)
    * cell with its total count — ≤ depth·width rows regardless of corpus
    * size. Null keys are excluded (a null hashes nowhere; count them
    * upstream if they matter). */
  def countMin(df: DataFrame, key: Column, width: Int, depth: Int,
               seed: String): DataFrame = {
    require(width >= 2, s"width must be >= 2, got $width")
    require(depth >= 1, s"depth must be >= 1, got $depth")
    df.filter(key.isNotNull)
      .select(posexplode(array(
        (0 until depth).map(i => cell(key, i, seed, width)): _*))
        .as(Seq("sk_row", "sk_col")))
      .groupBy(col("sk_row"), col("sk_col"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point estimates for the distinct keys of `probes` against a built
    * sketch (same (width, depth, seed) as the build — the caller owns
    * that contract the way bucketed tables own nBuckets). The sketch
    * side is ≤ d·w rows, so the lookup join broadcasts it; absent cells
    * read 0 (a key never seen estimates 0 only when ALL its rows are
    * collision-free zeros — still an overestimate, never an under).
    * Output: (key, est) — est ≥ true count always. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, key: Column,
                  width: Int, depth: Int, seed: String): DataFrame = {
    require(width >= 2, s"width must be >= 2, got $width")
    require(depth >= 1, s"depth must be >= 1, got $depth")
    probes.filter(key.isNotNull)
      .select(key.as("key")).distinct()
      .select(col("key"), posexplode(array(
        (0 until depth).map(i => cell(col("key"), i, seed, width)): _*))
        .as(Seq("sk_row", "sk_col")))
      .join(broadcast(sketch), Seq("sk_row", "sk_col"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
