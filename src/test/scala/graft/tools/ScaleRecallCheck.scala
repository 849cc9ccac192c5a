package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Round-9 ask #4 — ANN recall evidence beyond sf0.1. `/root/testdata`
  * tops out at sf0.1 (2,000 embeddings) and is read-only, so this
  * prober measures every REGISTERED ANN configuration on a
  * deterministic sf1-SCALE SURROGATE corpus: n seeded isotropic unit
  * vectors (d=64), which matches the measured generating distribution
  * of the real corpus — unit norms (σ≈4e-8), label-cosine separation
  * ≈0 (within 0.006 / cross −0.002 at sf0.1), and nearest-neighbour
  * cosine growth consistent with isotropy (0.37@500 → 0.41@2000).
  * Isotropy is also the HARD case for every index here (no cluster
  * structure to exploit), so surrogate recall is a conservative bound.
  *
  * The tool first re-measures each config on the surrogate at n=2000
  * (sf0.1 scale) to validate the surrogate against the real-corpus
  * numbers pinned in ExtensionQueries, then at n=20000 (sf1 scale,
  * 10×). Results are committed in RECALL_SCALE.md; a registered floor
  * above its measured sf1-scale recall is a retuning bug.
  *
  * Usage: sbt "Test/runMain graft.tools.ScaleRecallCheck [n ...]" */
object ScaleRecallCheck {

  /** Deterministic isotropic unit vector for `id` — one Random stream
    * per vector, seeded by a splitmix64-style mix so ids are decorrelated. */
  private def unitVec(id: Long, d: Int): Array[Float] = {
    var z = id * 0x9E3779B97F4A7C15L + 42L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    val rnd = new java.util.Random(z ^ (z >>> 31))
    val v = Array.fill(d)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / n).toFloat)
  }

  /** Distributed generation — vectors are a pure function of vec_id, so
    * content is identical to the original driver-side builder at any
    * partitioning (n=2M would otherwise materialize ~2 GB of boxed
    * floats on the driver). */
  private def corpus(spark: SparkSession, n: Int, d: Int = 64): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long]
      .mapPartitions(_.map(i => (i, unitVec(i, d).toSeq, (i % 10).toInt)))
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .repartition(if (n <= 100000) 8 else 32)
  }

  def main(args: Array[String]): Unit = {
    // args: sizes (numeric) and an optional config filter (names) —
    // `2000000 ivf ivfpq pca_ivf` runs only the IVF compositions at 2M
    val (nums, names) = args.partition(_.forall(_.isDigit))
    val sizes = if (nums.nonEmpty) nums.map(_.toInt).toSeq else Seq(2000, 20000)
    val only = names.toSet
    def want(c: String) = only.isEmpty || only(c)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (n <- sizes) {
      val emb = corpus(spark, n).localCheckpoint(eager = true)
      // adaptive gate: ~400 queries through n=500k (the sf0.1 convention
      // is %50; past n=20000 the modulus grows so the brute-force
      // baseline stays a bounded 400×n scan). At n ≥ 1M the 400×n exact
      // ground truth — not any serve path — is what blew the round-10
      // wall budget, so the gate widens again: ~100 queries at 2M keeps
      // the baseline cost at the 500k run's level (500 graded pairs,
      // recall noise ±0.03 — well inside the pinned floor margins).
      val qMod = if (n >= 1000000) n / 100L else math.max(50L, n / 400L)
      val queries = emb.filter(col("vec_id") % qMod === 0)
        .localCheckpoint(eager = true)
      val nQ = queries.count()
      def pairs(df: DataFrame) = df.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = pairs(Similarity.bruteForceTopK(queries, emb, k = 5))
      def rec(name: String, floor: Double, df: => DataFrame): Unit =
        if (want(name)) {
          val t0 = System.nanoTime()
          val r = (brute & pairs(df)).size.toDouble / brute.size
          val sec = (System.nanoTime() - t0) / 1e9
          val flag = if (r >= floor) "ok" else "BELOW FLOOR"
          println(f"n=$n%6d  $name%-14s recall=$r%.3f floor=$floor%.1f " +
            f"margin=${r - floor}%+.3f  $flag%s (${sec}%.1f s)")
        }

      // centroid count scales with √n past the registered 32 (the
      // production rule: posting-list length and probe fraction both
      // shrink as the corpus grows; the registered sf-scale config is
      // unchanged at n ≤ 20000 where √n ≤ 141 buys nothing)
      val nCent = math.max(32, math.ceil(math.sqrt(n.toDouble) / 2).toInt)
      val nProbe = math.max(12, nCent * 3 / 8)

      // exactly the registered configurations (ExtensionQueries.scala)
      rec("lsh", 0.7, Similarity.lshTopK(queries, emb, k = 5, bits = 4,
        tables = 8, multiProbe = 2))
      rec("ivf", 0.6, Similarity.ivfTopK(queries, emb, k = 5,
        nCentroids = 32, nProbe = 12, refineIters = 2))
      // the prod-scaled IVF row: √n/2 centroids, constant 37.5% probe
      // RATIO — serve volume stays the bounded fraction while per-list
      // length shrinks 1/√n
      if (nCent > 32)
        rec("ivf_scaled", 0.6, Similarity.ivfTopK(queries, emb, k = 5,
          nCentroids = nCent, nProbe = nProbe, refineIters = 2))
      // the registered AUTO-SIZED row (round 13): √n centroids + the
      // constant 375‰ probe fraction, both derived by ivfParamsAuto
      // from one count — the rule the ann_ivf_topk_auto oracle pins at
      // driver SFs, validated here at surrogate scale
      rec("ivf_auto", 0.6,
        Similarity.ivfTopKAuto(queries, emb, k = 5, refineIters = 2))
      rec("sq8", 0.9, Similarity.sqTopK(queries, emb, k = 5, rerank = 20))
      // scale-aware candidate budgets — a FIXED shortlist/rerank covers
      // 10× less of a 10× corpus (the round-7 red-row class; this sweep
      // caught PCA+Flat at 0.524 with shortlist=120 at n=20000). The
      // registered queries use these same formulas.
      val rerank = math.max(100, math.ceil(0.05 * n).toInt)
      val shortlist = math.max(120, math.ceil(0.06 * n).toInt)
      lazy val pqIdx = Similarity.buildPqIndex(emb, m = 16, k = 16).get
      rec("pq", 0.7,
        Similarity.pqTopK(queries, emb, pqIdx, k = 5, rerank = rerank))
      // the registered AUTO-SIZED PQ row (round 14): (m, k) derived
      // from one (count, dim) aggregate by pqParamsAuto — k byte-codes
      // once trainable, code bits tracking 2·log2(n); the rule the
      // ann_pq_topk_auto oracle pins at driver SFs, validated here at
      // surrogate scale
      if (want("pq_auto")) {
        val pqAutoIdx = Similarity.buildPqIndexAuto(emb).get
        // the auto row serves with pqRerankAuto (round 16): the mid-n
        // (10k-50k) 15% bump where auto codes are coarsest vs corpus size
        val rerankAuto = Similarity.pqRerankAuto(n)
        println(f"n=$n%6d  pq_auto params: m=${pqAutoIdx.m} k=${pqAutoIdx.k} rerank=$rerankAuto")
        rec("pq_auto", 0.7,
          Similarity.pqTopK(queries, emb, pqAutoIdx, k = 5,
            rerank = rerankAuto))
      }
      rec("ivfpq", 0.6, Similarity.buildIvfIndex(emb, nCentroids = 32,
        refineIters = 2)
        .map(ivf => Similarity.ivfPqTopK(queries, emb, ivf, pqIdx, k = 5,
          nProbe = 12, rerank = rerank)).get)
      if (nCent > 32 && want("ivfpq_scaled"))
        rec("ivfpq_scaled", 0.6, Similarity.buildIvfIndex(emb,
          nCentroids = nCent, refineIters = 2)
          .map(ivf => Similarity.ivfPqTopK(queries, emb, ivf, pqIdx, k = 5,
            nProbe = nProbe, rerank = rerank)).get)
      lazy val pcaModel = Similarity.pcaFit(
        Similarity.normalizedEmbeddings(emb), k = 32).get
      rec("pca", 0.7, Similarity.pcaTopK(queries, emb, pcaModel, k = 5,
        shortlist = shortlist))
      rec("pca_ivf", 0.6, Similarity.pcaIvfTopK(queries, emb, pcaModel,
        k = 5, nCentroids = 32, nProbe = 12, refineIters = 2))
      if (nCent > 32 && want("pca_ivf_scaled"))
        rec("pca_ivf_scaled", 0.6, Similarity.pcaIvfTopK(queries, emb,
          pcaModel, k = 5, nCentroids = nCent, nProbe = nProbe,
          refineIters = 2))

      // Serve-candidate volume per config (round-10 ask #4): the probed-
      // posting count is what each query's exact scoring stage actually
      // touches — SUBLINEAR serve means this stays a bounded corpus
      // FRACTION (≈ nProbe/nCentroids for IVF compositions), while the
      // flat/diagnostic variants are linear by construction.
      def probedVolume(idx: Similarity.IvfIndex, qs: DataFrame): Double = {
        val probes = Similarity.assign(idx.centroids, qs, "query_id", keep = 12)
        probes.join(idx.postings, Seq("centroid_id"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id")).distinct()
          .count().toDouble / nQ
      }
      def probedVolumeAt(centroids: Int, probe: Int): Double = {
        val idx = Similarity.buildIvfIndex(emb, nCentroids = centroids,
          refineIters = 2).get
        val probes = Similarity.assign(idx.centroids, queries, "query_id",
          keep = probe)
        probes.join(idx.postings, Seq("centroid_id"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id")).distinct()
          .count().toDouble / nQ
      }
      val vols =
        (if (want("ivf") || want("ivfpq"))
          Seq("ivf/ivfpq probed" -> probedVolumeAt(32, 12)) else Nil) ++
        (if (nCent > 32 && (want("ivf_scaled") || want("ivfpq_scaled")))
          Seq(s"ivf_scaled probed" -> probedVolumeAt(nCent, nProbe)) else Nil) ++
        (if (want("pca_ivf"))
          Seq("pca_ivf probed" -> {
            val pcaIdx = Similarity.buildIvfIndex(
              Similarity.pcaReduced(emb, pcaModel), nCentroids = 32,
              refineIters = 2).get
            probedVolume(pcaIdx, Similarity.pcaReduced(queries, pcaModel))
          }) else Nil) ++
        (if (want("pq")) Seq("pq rerank" -> rerank.toDouble) else Nil) ++
        (if (want("pca")) Seq("pca shortlist" -> shortlist.toDouble) else Nil)
      vols.foreach { case (name, v) =>
        println(f"n=$n%6d  cand/$name%-18s ${v}%10.1f  (${v / n * 100}%5.2f%% of corpus)")
      }
    }
    spark.stop()
  }
}
