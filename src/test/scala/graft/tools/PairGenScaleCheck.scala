package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Round-11 scale evidence for the PRODUCTION pair-generation paths —
  * the registered `dedup_minhash_lsh` / `dedup_embedding_cosine_lsh`
  * queries are recall HARNESSES (they compute the exact ground truth,
  * an intentional O(n²), inside the query), so their ScaleBenchCheck
  * ratios (26×/65× at 10×) conflate the quadratic oracle with the
  * production operator. This tool times the operators alone, and
  * validates the two scale mitigations:
  *
  *  - MinHash: the opt-in hot-bucket cap (`maxBucket`) — candidate
  *    volume within a band bucket is inherently quadratic in occupancy;
  *    the cap bounds it and the tool counts how many verified pairs the
  *    cap actually costs at each scale.
  *  - Hyperplane LSH: the OCCUPANCY RULE — per-table bucket count must
  *    grow with n (bits ≈ log₂(n / targetOccupancy), target ≈ 500) so
  *    per-bucket self-join work stays constant per vector; recall lost
  *    to narrower buckets is bought back with `tables`/`multiProbe`.
  *    The tool measures recall of the scaled config against the exact
  *    (deliberately unguarded) ground truth at sf1 scale.
  *
  * Usage: sbt "Test/runMain graft.tools.PairGenScaleCheck"
  * (reuses /tmp/graft_sf1 if ScaleBenchCheck already built it). */
object PairGenScaleCheck {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sf01 = "/root/testdata/sf0.1"
    val sf1 = "/tmp/graft_sf1"
    if (!new java.io.File(s"$sf1/documents.parquet").exists()) {
      println("building sf1 surrogate (10x sf0.1) ...")
      ScaleBenchCheck.buildSurrogate(spark, sf01, sf1)
    }
    def docs(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
    def emb(dir: String) = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

    def timed(label: String)(df: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-46s $sec%8.2f s  $n%9d pairs")
      (sec, n)
    }

    println("== MinHash LSH pairs (production operator, registered config) ==")
    val (tMm01, nMm01) = timed("minhash sf0.1 uncapped")(
      Dedup.minhashLshPairs(docs(sf01), n = 3, numPerm = 32,
        rowsPerBand = 2, num = 1, den = 2))
    val (tMm1, nMm1) = timed("minhash sf1   uncapped")(
      Dedup.minhashLshPairs(docs(sf1), n = 3, numPerm = 32,
        rowsPerBand = 2, num = 1, den = 2))
    val (tMc01, nMc01) = timed("minhash sf0.1 maxBucket=512")(
      Dedup.minhashLshPairs(docs(sf01), n = 3, numPerm = 32,
        rowsPerBand = 2, num = 1, den = 2, maxBucket = 512))
    val (tMc1, nMc1) = timed("minhash sf1   maxBucket=512")(
      Dedup.minhashLshPairs(docs(sf1), n = 3, numPerm = 32,
        rowsPerBand = 2, num = 1, den = 2, maxBucket = 512))
    println(f"  uncapped ratio ${tMm1 / tMm01}%5.2f  capped ratio ${tMc1 / tMc01}%5.2f" +
      f"  pairs lost to cap: sf0.1 ${nMm01 - nMc01}%d / sf1 ${nMm1 - nMc1}%d")

    // round 13 — the AUTO-SIZED registration (minhashParamsAuto: r grows
    // with log n, bands re-price the S-curve): time it at both scales
    // and diff its VERIFIED pair set against the fixed config's (both
    // have precision 1.0 by exact verify, so an asymmetric loss is a
    // recall gap of exactly that side)
    val (tMa01, _) = timed("minhash sf0.1 AUTO")(
      Dedup.minhashLshPairsAuto(docs(sf01), n = 3, num = 1, den = 2))
    val (tMa1, _) = timed("minhash sf1   AUTO")(
      Dedup.minhashLshPairsAuto(docs(sf1), n = 3, num = 1, den = 2))
    def pairSet(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixedPairs = pairSet(Dedup.minhashLshPairs(docs(sf1), n = 3,
      numPerm = 32, rowsPerBand = 2, num = 1, den = 2))
    val autoPairs = pairSet(
      Dedup.minhashLshPairsAuto(docs(sf1), n = 3, num = 1, den = 2))
    println(f"  auto ratio ${tMa1 / tMa01}%5.2f  sf1 pair-set diff: " +
      f"fixed-only ${(fixedPairs -- autoPairs).size}%d, " +
      f"auto-only ${(autoPairs -- fixedPairs).size}%d " +
      f"(of ${fixedPairs.size}%d fixed / ${autoPairs.size}%d auto)")

    // round 14 — the AUTO-SIZED SimHash registration (simhashBlocksAuto:
    // the Manku block-combination layout, m grows with n): time it at
    // both scales and prove EXACTNESS by cross-layout agreement — every
    // m > d yields a COMPLETE candidate stage for Hamming <= d, so the
    // classic 4-block layout, the auto-chosen one, and a wider one must
    // return the IDENTICAL pair set; any diff is a layout bug.
    println("== SimHash pairs (auto block layout, maxDist=3) ==")
    for (dir <- Seq(sf01, sf1)) {
      val d = docs(dir)
      val nDocs = d.count()
      val mAuto = Dedup.simhashBlocksAuto(nDocs, maxDist = 3)
      val sk = Dedup.simhashSketch(d, n = 3).localCheckpoint(eager = true)
      def run(m: Int) = {
        val t0 = System.nanoTime()
        val p = pairSet(Dedup.simhashPairsFromSketchMasked(sk, 3,
          Dedup.simhashTableMasks(m, 3)))
        ((System.nanoTime() - t0) / 1e9, p)
      }
      val (t4, p4) = run(4)
      val (ta, pa) = run(mAuto)
      val (tw, pw) = run(math.min(mAuto + 2, 12))
      println(f"  n=$nDocs%6d auto m=$mAuto: m=4 $t4%6.2f s, " +
        f"m=$mAuto $ta%6.2f s, m=${math.min(mAuto + 2, 12)} $tw%6.2f s; " +
        f"pairs ${pa.size}%d; layouts agree: ${p4 == pa && pa == pw}%s")
      require(p4 == pa && pa == pw,
        s"block layouts DISAGREE at $dir — completeness broken")
    }

    println("== Hyperplane-LSH cosine pairs (threshold 0.45) ==")
    val (tC01, _) = timed("cosine sf0.1 bits=2 t=12 mp=1 (registered)")(
      Similarity.cosinePairsBucketed(emb(sf01), 0.45, bits = 2,
        tables = 12, multiProbe = 1))
    val (tC1fix, _) = timed("cosine sf1   bits=2 t=12 mp=1 (fixed cfg)")(
      Similarity.cosinePairsBucketed(emb(sf1), 0.45, bits = 2,
        tables = 12, multiProbe = 1))
    // occupancy rule: bits = log2(n / 500) -> 20000/500 = 40 -> ~5 bits
    val (tC1s, _) = timed("cosine sf1   bits=5 t=12 mp=1 (occupancy rule)")(
      Similarity.cosinePairsBucketed(emb(sf1), 0.45, bits = 5,
        tables = 12, multiProbe = 1))
    println(f"  fixed-cfg ratio ${tC1fix / tC01}%5.2f  scaled-cfg ratio ${tC1s / tC01}%5.2f")

    // recall of the scaled config vs the exact ground truth at sf1
    val exact = Similarity.cosinePairs(emb(sf1), 0.45, maxRows = 25000L)
      .localCheckpoint(eager = true)
    val scaled = Similarity.cosinePairsBucketed(emb(sf1), 0.45, bits = 5,
      tables = 12, multiProbe = 1).localCheckpoint(eager = true)
    val nTrue = exact.count()
    val nHit = scaled.join(exact, Seq("vec_a", "vec_b"), "left_semi").count()
    println(f"  sf1 scaled-cfg recall ${nHit.toDouble / nTrue}%.3f " +
      f"($nHit%d of $nTrue%d true pairs; precision 1.0 by exact verify)")
    spark.stop()
  }
}
