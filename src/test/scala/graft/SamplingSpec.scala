package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Sampling invariants — the properties that make hash-gate sampling the
  * right primitive for training data, pinned for BOTH hash algos:
  * determinism under re-run and re-partitioning, nested subsets across
  * fractions, realized fraction ≈ requested, split disjointness/
  * exhaustiveness and its subset relation to the plain sample, and
  * per-tag seed independence of mixtures. Exact cross-engine membership
  * is oracle-checked by the ext_hash_* / ext_corpus_mixture rows (md5
  * path); this spec pins the algebra. */
class SamplingSpec extends SparkSpecBase {

  import spark.implicits._

  private lazy val keys: DataFrame = spark.range(2000).toDF("id")

  private def ids(df: DataFrame): Set[Long] =
    df.select(col("id")).as[Long].collect().toSet

  for (algo <- Seq("xxh64", "md5")) {

    test(s"$algo: deterministic and partitioning-invariant") {
      val once = ids(Sampling.sample(keys, col("id"), 0.3, "s1", algo))
      val again = ids(Sampling.sample(keys, col("id"), 0.3, "s1", algo))
      val reparted = ids(Sampling.sample(keys.repartition(7), col("id"), 0.3, "s1", algo))
      assert(once === again && once === reparted)
    }

    test(s"$algo: samples nest across fractions and realize them") {
      val s10 = ids(Sampling.sample(keys, col("id"), 0.1, "s2", algo))
      val s30 = ids(Sampling.sample(keys, col("id"), 0.3, "s2", algo))
      val s60 = ids(Sampling.sample(keys, col("id"), 0.6, "s2", algo))
      assert(s10.subsetOf(s30) && s30.subsetOf(s60))
      // n=2000: 4-sigma Bernoulli band is ±~4.4% absolute at p=0.3
      Seq((s10, 0.1), (s30, 0.3), (s60, 0.6)).foreach { case (s, p) =>
        val realized = s.size.toDouble / 2000
        assert(math.abs(realized - p) < 0.05,
          s"fraction $p realized $realized")
      }
      assert(ids(Sampling.sample(keys, col("id"), 0.0, "s2", algo)).isEmpty)
      assert(ids(Sampling.sample(keys, col("id"), 1.0, "s2", algo)).size === 2000)
    }

    test(s"$algo: hashSplit is disjoint, exhaustive, and aligned with sample()") {
      val split = Sampling.hashSplit(keys, col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "split", "s3", algo)
      val byLabel = split.groupBy(col("split")).count()
        .as[(String, Long)].collect().toMap
      assert(byLabel.values.sum === 2000L && byLabel.keySet === Set("train", "val", "test"))
      assert(math.abs(byLabel("train") - 1600.0) < 100)
      // the 0.8 sample IS the train split (same seed): complements line up
      val sampled = ids(Sampling.sample(keys, col("id"), 0.8, "s3", algo))
      val train = ids(split.where(col("split") === "train"))
      assert(sampled === train)
    }

    test(s"$algo: stratified applies per-stratum fractions") {
      val strat = keys.withColumn("grp", when(col("id") % 2 === 0, "a").otherwise("b"))
      val out = Sampling.stratified(strat, col("id"), col("grp"),
        Map("a" -> 0.1), defaultFraction = 0.9, seed = "s4", algo = algo)
      val counts = out.groupBy(col("grp")).count().as[(String, Long)].collect().toMap
      assert(counts("a") < 200 && counts("b") > 800,
        s"expected ~100 a / ~900 b, got $counts")
    }

    test(s"$algo: mixture tags provenance and salts seeds per tag") {
      val a = keys.withColumn("src", lit("a"))
      val b = keys.withColumn("src", lit("b"))
      val mix = Sampling.mixture(Seq(("a", a, 0.5), ("b", b, 0.5)),
        col("id"), "tag", "s5", algo)
      val byTag = mix.groupBy(col("tag")).agg(collect_set(col("id")).as("ks"))
        .as[(String, Seq[Long])].collect().toMap
      assert(byTag.keySet === Set("a", "b"))
      // same keys, same fraction — only the tag salt differs; identical
      // keep-sets would mean the corpora's sampling decisions correlate
      assert(byTag("a").toSet !== byTag("b").toSet)
    }
  }

  test("temperatureMixture: tail kept whole, head flattened, realized " +
    "fractions in band, deterministic") {
    import spark.implicits._
    val skewed = (
      (1 to 1000).map(i => (i.toLong, "big")) ++
      (1001 to 1100).map(i => (i.toLong, "mid")) ++
      (1101 to 1110).map(i => (i.toLong, "small"))).toDF("id", "dom")
    val out = Sampling.temperatureMixture(
      skewed, col("id"), col("dom"), targetFraction = 0.3, seed = "tm1")
    val kept = out.groupBy("dom").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // f_small = min(1, 333*(sqrt(10)/wsum)/10) > 1 -> every row kept
    assert(kept("small") === 10L)
    // f_big = 0.3*1110*(sqrt(1000)/wsum)/1000 ~ 0.2352; 4-sigma ~ 0.054
    val fBig = kept("big") / 1000.0
    assert(fBig > 0.235 - 0.054 && fBig < 0.235 + 0.054, s"fBig $fBig")
    // flattening: big is 90.1% of input; the design share after α = 0.5
    // scaling is q_big = sqrt(1000)/Σ√n ≈ 0.706 — realized share lands
    // near it, well under the input share
    val outShare = kept("big").toDouble / kept.values.sum
    assert(outShare > 0.6 && outShare < 0.8,
      s"head share $outShare not near the 0.706 design share")
    // deterministic and partitioning-invariant
    val again = Sampling.temperatureMixture(
      skewed.repartition(7), col("id"), col("dom"), 0.3, "tm1")
    assert(out.select("id").collect().map(_.getLong(0)).toSet ===
      again.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("temperatureMixture: unbounded domain cardinality fails loud, never OOMs the driver") {
    import spark.implicits._
    // a free-text-grade domain column: every row its own domain
    val unbounded = (1 to 50).map(i => (i.toLong, s"dom$i")).toDF("id", "dom")
    val e = intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(unbounded, col("id"), col("dom"),
        targetFraction = 0.5, seed = "tmx", maxDomains = 10)
    }
    assert(e.getMessage.contains("distinct domains"))
    // a bounded mixture at the same cap is unaffected
    val ok = Sampling.temperatureMixture(
      (1 to 50).map(i => (i.toLong, s"dom${i % 3}")).toDF("id", "dom"),
      col("id"), col("dom"), targetFraction = 0.5, seed = "tmx",
      maxDomains = 10)
    assert(ok.count() > 0)
  }

  test("kFold: disjoint, exhaustive, roughly balanced, deterministic") {
    for (algo <- Seq("xxh64", "md5")) {
      val folds = Sampling.kFold(keys, col("id"), 5, "fold", "kf1", algo)
      val byFold = folds.groupBy("fold").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byFold.keySet === (0L until 5L).toSet)
      assert(byFold.values.sum === 2000L)          // exhaustive, disjoint
      byFold.values.foreach(n => assert(n > 300 && n < 500, s"fold size $n"))
      val again = Sampling.kFold(keys.repartition(9), col("id"), 5, "fold",
        "kf1", algo)
      assert(folds.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
        again.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    }
  }

  test("sampleNPerGroup: exact quota per group, smaller groups whole, stable under repartition") {
    import spark.implicits._
    // groups of size 50, 12, and 3 — quota 12 must return 12, 12, 3
    val rows = (0 until 50).map(i => ("big", i.toLong)) ++
      (100 until 112).map(i => ("mid", i.toLong)) ++
      (200 until 203).map(i => ("tiny", i.toLong))
    val df = rows.toDF("g", "id")
    for (algo <- Seq("xxh64", "md5")) {
      val out = Sampling.sampleNPerGroup(df, Seq("g"), col("id"), n = 12,
        seed = "s7", algo = algo)
      val byG = out.groupBy("g").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byG === Map("big" -> 12L, "mid" -> 12L, "tiny" -> 3L), algo)
      // membership is a pure function of (key, seed): any partitioning
      val again = Sampling.sampleNPerGroup(df.repartition(13), Seq("g"),
        col("id"), n = 12, seed = "s7", algo = algo)
      def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
        d.select("id").collect().map(_.getLong(0)).toSet
      assert(ids(out) === ids(again), algo)
      // a different seed draws a different quota (astronomically likely)
      val other = Sampling.sampleNPerGroup(df, Seq("g"), col("id"), n = 12,
        seed = "s8", algo = algo)
      assert(ids(out.filter(col("g") === "big")) !==
        ids(other.filter(col("g") === "big")), algo)
    }
    // reserved internal name fails loud
    val e = intercept[IllegalArgumentException] {
      Sampling.sampleNPerGroup(df.withColumn("__rk", lit(1)), Seq("g"),
        col("id"), 1, "s")
    }
    assert(e.getMessage.contains("__rk"))
  }

  test("ppsSample: expected-k PPS gate — saturated weights always kept, nonpositive excluded, partition-invariant") {
    import spark.implicits._
    // 999 unit-weight rows + one whale carrying half the total weight
    val df = ((1L to 999L).map(i => (i, 1L)) :+ (1000L, 999L))
      .toDF("id", "w")
      .unionByName(Seq((1001L, 0L), (1002L, -5L)).toDF("id", "w"))
      .unionByName(Seq((Some(1003L), None: Option[Long])).toDF("id", "w"))
    val out = Sampling.ppsSample(df, col("id"), col("w"), k = 50,
      seed = "pps1", algo = "md5")
    val ids = out.select("id").collect().map(_.getLong(0)).toSet
    // whale: p = min(1, 50*999/1998) = 1 -> always in the sample
    assert(ids.contains(1000L))
    // w <= 0 and null weights can never appear
    assert(!ids.exists(_ >= 1001L))
    // expected |sample| = 1 (whale) + 999 * (50/1998 * 999/999) ~ 26
    assert(ids.size > 5 && ids.size < 80)
    // membership is a pure function of (id, w, W, seed)
    val again = Sampling.ppsSample(df.repartition(7), col("id"), col("w"),
      k = 50, seed = "pps1", algo = "md5")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === ids)
    // p column is exposed and capped at 1
    val ps = out.select("p").collect().map(_.getDouble(0))
    assert(ps.forall(p => p > 0.0 && p <= 1.0))
    intercept[IllegalArgumentException] {
      Sampling.ppsSample(df, col("id"), col("w"), k = 0, seed = "s")
    }
  }

  test("weightedTopK: exact k, weight monotonicity in expectation, driver differential, determinism") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, if (i <= 200) 1L else 20L))
      .toDF("id", "w")
      .unionByName(Seq((500L, 0L)).toDF("id", "w")) // ineligible
    val out = Sampling.weightedTopK(df, col("id"), col("w"), k = 40,
      seed = "es1").collect()
    assert(out.length === 40)
    val ids = out.map(_.getAs[Long]("id")).toSet
    assert(!ids.contains(500L))
    // heavy items (w=20) should dominate a weight-proportional draw:
    // E[heavy] ~ 40 * (200*20)/(200*21) ~ 38
    assert(ids.count(_ > 200L) > 25)
    // differential: the selection is exactly the driver-side top-k of
    // the same md5 -> u -> u^(1/w) formula
    val md = java.security.MessageDigest.getInstance("MD5")
    def esKey(id: Long, w: Long): Double = {
      val hex = md.digest(s"$id:es1".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) /
        math.pow(2.0, 60)
      math.pow(u, 1.0 / w)
    }
    val expect = (1L to 400L).map(i => (i, if (i <= 200) 1L else 20L))
      .map { case (i, w) => (esKey(i, w), i) }
      .sortBy { case (k2, i) => (-k2, i) }.take(40).map(_._2).toSet
    assert(ids === expect)
    // partition-invariant
    val again = Sampling.weightedTopK(df.repartition(11), col("id"),
      col("w"), k = 40, seed = "es1")
      .collect().map(_.getAs[Long]("id")).toSet
    assert(again === ids)
  }

  test("poissonBootstrap: inverse-CDF table pinned; full differential vs a driver re-derivation; layout-invariant") {
    // the shared table IS the cross-engine contract — pin its exact cells
    assert(Sampling.PoissonCdfMicro === Seq(367879L, 735759L, 919699L,
      981012L, 996340L, 999406L, 999917L, 999990L))
    assert(Sampling.bootstrapRanks(80) === ((2, 78)))

    val df = (1L to 200L).map(i => ("g", i, (i % 10).toDouble))
      .toDF("k", "id", "v")
    val out = Sampling.poissonBootstrap(df, Seq("k"), col("id"), col("v"),
      replicates = 40, seed = "bt")
      .collect().map(r => (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.length === 1)

    // independent driver-side re-derivation of the ENTIRE procedure
    // (own md5, own 40-bit slice selection, own weight fold, own order
    // statistics) — one md5 serves replicates 3b..3b+2 via hex slices
    def u(key: Long, b: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$key:${b / 3}:bt".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val off = (b % 3) * 10
      java.lang.Long.parseLong(hex.substring(off, off + 10), 16) % 1000000L
    }
    def weight(uu: Long): Long = Sampling.PoissonCdfMicro.count(uu >= _).toLong
    val rows = (1L to 200L).map(i => i -> math.round((i % 10).toDouble * 1e6))
    val means = (0 until 40).flatMap { b =>
      val ws = rows.map { case (i, v) => (weight(u(i, b)), v) }
      val sw = ws.map(_._1).sum
      if (sw == 0) None
      else Some((ws.map { case (w, v) => w * v }.sum.toDouble / sw.toDouble
        / 1e6, b))
    }.sortBy(identity)
    val (loRank, hiRank) = Sampling.bootstrapRanks(40)
    val expMean = rows.map(_._2).sum.toDouble / 200.0 / 1e6
    assert(out.head === ((200L, expMean,
      means(loRank - 1)._1, means(hiRank - 1)._1)))
    // the interval is a real interval around the mean on this data
    assert(out.head._3 < expMean && expMean < out.head._4)
    // physical layout cannot move a deterministic resample
    val repart = Sampling.poissonBootstrap(df.repartition(13), Seq("k"),
      col("id"), col("v"), replicates = 40, seed = "bt")
      .collect().map(r => (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(repart.toSeq === out.toSeq)
    intercept[IllegalArgumentException] {
      Sampling.poissonBootstrap(df, Seq("k"), col("id"), col("v"), 2, "bt")
    }
  }

  test("epochShuffle: deterministic per seed, independent across seeds, " +
      "layout-invariant, both algos") {
    import spark.implicits._
    val df = (1L to 200L).toDF("id")
    for (algo <- Seq("xxh64", "md5")) {
      def order(d: DataFrame, seed: String) =
        Sampling.epochShuffle(d, col("id"), seed, algo)
          .select("id").collect().map(_.getLong(0)).toSeq
      val e1 = order(df, "e1")
      assert(e1 === order(df, "e1"))                    // reproducible
      assert(e1 === order(df.repartition(7), "e1"))     // layout-invariant
      assert(e1.sorted === (1L to 200L))                // a permutation
      assert(e1 !== (1L to 200L).toSeq)                 // actually shuffled
      val e2 = order(df, "e2")
      assert(e1 !== e2)                                 // epochs differ
      // independence beyond inequality: positions decorrelate (no long
      // common prefix, most ids move)
      assert(e1.zip(e2).count { case (a, b) => a == b } < 20)
    }
    intercept[IllegalArgumentException] {
      Sampling.epochShuffle(df, col("id"), "s", "crc32")
    }
    ()
  }

  test("selectWithinBudget: greedy prefix, exact crossing boundary, no " +
      "backfill, zero budget") {
    import spark.implicits._
    // priority order (desc): d (40) > c (30) > b (20) > a (10)
    val df = Seq(("a", 10L, 5L), ("b", 20L, 4L), ("c", 30L, 7L),
      ("d", 40L, 6L)).toDF("id", "prio", "w")
    def sel(budget: Long) = Sampling.selectWithinBudget(df, col("prio"),
      col("w"), col("id"), budget)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getBoolean(4)))
      .toMap
    // budget 13: d (cum 6) in, c (cum 13) in, b (17) out, a (22) out —
    // and crucially b's exclusion does NOT backfill a (cum still 22)
    assert(sel(13L) === Map("d" -> (6L, true), "c" -> (13L, true),
      "b" -> (17L, false), "a" -> (22L, false)))
    // exact boundary inclusive
    assert(sel(17L)("b") === ((17L, true)))
    // zero budget selects nothing but still exports the running sums
    assert(sel(0L).values.forall(!_._2))
    intercept[IllegalArgumentException] {
      Sampling.selectWithinBudget(df, col("prio"), col("w"), col("id"), -1L)
    }
    ()
  }
}
