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

  /** Mergeable fixed-bin histogram (round 9) — the third mergeable
    * sketch family next to count-min (occurrences) and HLL (distincts):
    * QUANTILES. Per (group, bin) counts over an equi-width grid between
    * the group's min and max; shards built independently merge by
    * integer ADDITION (exact, order-free), daily histograms roll up to
    * monthly without touching raw data, and any engine re-derives the
    * whole sketch bitwise (bin = clamped floor((v−lo)/width), a fixed
    * IEEE chain — no sampling, no interpolation). Error is bounded by
    * one bin width; for long-tailed domains pick log-spaced callsite
    * pre-transforms rather than more bins.
    *
    * Output: (group…, bin, cnt) plus the group's (lo, width, n_bins)
    * carried on every row so the sketch is self-describing (the
    * persisted-artifact convention: serve needs no side channel). */
  def binHistogram(df: DataFrame, group: Seq[String], value: Column,
                   nBins: Int): DataFrame =
    binHistogramWith(df, histBounds(df, group, value, nBins),
      group, value, nBins)

  /** The grid contract: per-group (lo, width) for an nBins equi-width
    * histogram. Shards MUST share one grid to be mergeable — compute
    * bounds once (or fix them by domain contract) and pass the same
    * frame to every [[binHistogramWith]] call; per-shard bounds would
    * produce incompatible bins, the pack/probe drift hazard. */
  def histBounds(df: DataFrame, group: Seq[String], value: Column,
                 nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 100000, s"nBins must be in [2,1e5]: $nBins")
    val gc = group.map(col)
    df.filter(value.isNotNull)
      .groupBy(gc: _*).agg(min(value).as("lo"), max(value).as("hi"))
      .withColumn("width",
        when(col("hi") === col("lo"), lit(1.0))
          .otherwise((col("hi") - col("lo")) / lit(nBins.toDouble)))
      .drop("hi")
  }

  /** Histogram of one shard against a FIXED grid (see [[histBounds]]).
    * Values outside the grid clamp to the edge bins — a late shard with
    * a new outlier still lands in the sketch. */
  def binHistogramWith(df: DataFrame, bounds: DataFrame, group: Seq[String],
                       value: Column, nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 100000, s"nBins must be in [2,1e5]: $nBins")
    val gc = group.map(col)
    df.filter(value.isNotNull)
      .join(broadcast(bounds), group)
      .withColumn("bin",
        least(greatest(floor((value - col("lo")) / col("width"))
          .cast("long"), lit(0L)), lit(nBins.toLong - 1)))
      .groupBy(gc :+ col("bin") :+ col("lo") :+ col("width"): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("n_bins", lit(nBins))
  }

  /** Merge histogram shards built on the SAME grid: integer addition
    * per (group, bin) — exact, order-free, associative; the property
    * that lets 1000 executors sketch independently and daily sketches
    * roll up to monthly. */
  /** Merge count-min shards built with the SAME (width, depth, seed):
    * cell-wise addition — the mergeability the sketch is documented
    * with, as an API instead of a hand-written union+groupBy a caller
    * can get subtly wrong (round 15; the histogram and bloom families
    * already had their merge helpers). */
  def mergeCountMin(shards: Seq[DataFrame]): DataFrame = {
    require(shards.nonEmpty, "no count-min shards to merge")
    shards.reduce(_ unionByName _)
      .groupBy(col("sk_row"), col("sk_col"))
      .agg(sum(col("c")).as("c"))
  }

  def mergeHistograms(shards: Seq[DataFrame], group: Seq[String]): DataFrame = {
    require(shards.nonEmpty, "no histogram shards to merge")
    val gc = group.map(col)
    shards.reduce(_ unionByName _)
      .groupBy(gc :+ col("bin") :+ col("lo") :+ col("width")
        :+ col("n_bins"): _*)
      .agg(sum(col("cnt")).as("cnt"))
      .select((gc :+ col("bin") :+ col("lo") :+ col("width")
        :+ col("cnt") :+ col("n_bins")): _*)
  }

  /** Bloom filter (Bloom 1970) — the FOURTH mergeable sketch family
    * (count-min answers "how often", HLL "how many distinct", the binned
    * histogram "what quantile"; bloom answers MEMBERSHIP: "was this key
    * ever seen?"): an m-bit array where inserting a key sets the k
    * md5-derived positions h₀(key)..h_{k−1}(key), and a probe answers
    * "possibly present" iff ALL k positions are set. False negatives are
    * impossible (inserting a key sets every bit its probe will read);
    * false positives occur at ≈ (1 − e^{−kn/m})^k — the one-sided-error
    * trade every sketch in this file makes, stated in the probe contract.
    *
    * Representation: the sketch frame IS the set-bit set — one `bit` row
    * per set position, ≤ m rows no matter the corpus size (the distinct
    * combines map-side, so the shuffle carries ≤ m rows per partition).
    * Merging sketches built with the same (bits, hashes, seed) is bitwise
    * OR = UNION DISTINCT of bit rows — exact, order-free, and IDEMPOTENT,
    * which is why the streaming maintenance
    * (StreamingAnalytics.runBloomMembership) needs no batch ledger:
    * re-delivering a batch re-unions bits already present, HLL-style
    * idempotence-by-algebra (count-min's additive cells need the ledger).
    *
    * Hashing is the engine's md5 cross-engine convention (position i of a
    * key = 60-bit md5("i:key:seed") prefix mod bits — the [[cell]] chain
    * count-min uses), so any engine with md5 re-derives the ENTIRE bit
    * set and a DuckDB oracle hash-matches probes instead of settling for
    * invariant booleans.
    *
    * 100 TB shape: build is one map-side-combined aggregate to ≤ m rows;
    * the built sketch is kilobytes (parquet-persistable, broadcastable);
    * a probe is a broadcast join — the cheap pre-filter in front of an
    * expensive exact lookup (seen-URL gates, incremental-dedup prefilters,
    * the runtime bloom-join pruning BloomPrune makes explicit). */
  def bloom(df: DataFrame, key: Column, bits: Int, hashes: Int,
            seed: String): DataFrame = {
    require(bits >= 2, s"bits must be >= 2, got $bits")
    require(hashes >= 1, s"hashes must be >= 1, got $hashes")
    df.filter(key.isNotNull)
      .select(explode(array(
        (0 until hashes).map(i => cell(key, i, seed, bits)): _*)).as("bit"))
      .distinct()
  }

  /** Membership probes for the distinct keys of `probes` against a built
    * [[bloom]] sketch (same (bits, hashes, seed) as the build — the
    * caller-owned contract, as with [[cmsEstimate]]). The sketch side is
    * ≤ m rows, so the lookup join broadcasts. Output:
    * `(key, might_contain)` — `false` is definitive (never inserted),
    * `true` means "inserted, or a k-way hash collision". */
  def bloomMightContain(sketch: DataFrame, probes: DataFrame, key: Column,
                        bits: Int, hashes: Int, seed: String): DataFrame = {
    require(bits >= 2, s"bits must be >= 2, got $bits")
    require(hashes >= 1, s"hashes must be >= 1, got $hashes")
    probes.filter(key.isNotNull)
      .select(key.as("key")).distinct()
      .select(col("key"), explode(array(
        (0 until hashes).map(i => cell(col("key"), i, seed, bits)): _*))
        .as("bit"))
      .join(broadcast(sketch.withColumn("__set", lit(true))), Seq("bit"), "left")
      .groupBy(col("key"))
      // a key probes exactly `hashes` rows (duplicate positions probe the
      // same bit twice and match twice) — all-present ⇔ `hashes` matches
      .agg((count(col("__set")) === lit(hashes.toLong)).as("might_contain"))
  }

  /** Merge bloom shards built on the same (bits, hashes, seed): bitwise
    * OR = union-distinct of bit rows — exact, order-free, idempotent.
    * Shards sketched independently on 1000 executors (or daily sketches
    * rolling up to monthly) merge without touching raw data. */
  def mergeBlooms(shards: Seq[DataFrame]): DataFrame = {
    require(shards.nonEmpty, "no bloom shards to merge")
    shards.reduce(_ unionByName _).distinct()
  }

  /** Quantile estimates from a (merged) [[binHistogram]]: for each
    * probability p the estimate is the RIGHT EDGE `lo + (bin+1)·width`
    * of the first bin whose cumulative count reaches rank ceil(p·n) —
    * a fixed arithmetic rule on exact integers, so estimates from any
    * merge order (or any engine) agree bitwise. One window pass over
    * the |groups|·nBins sketch — data-size-independent serve cost. */
  def histQuantiles(hist: DataFrame, group: Seq[String],
                    probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0),
      s"probs must lie in (0,1]: $probs")
    val gc = group.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gc: _*).orderBy(col("bin"))
    val frame = org.apache.spark.sql.expressions.Window
      .partitionBy(gc: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("n", sum(col("cnt")).over(frame))
    val qCols = probs.zipWithIndex.map { case (p, i) =>
      min(when(col("cum") >= ceil(lit(p) * col("n")).cast("long"),
        col("lo") + (col("bin") + lit(1L)) * col("width"))).as(s"q_$i")
    }
    cum.groupBy(gc: _*)
      .agg(max(col("n")).as("n"), qCols: _*)
  }
}
