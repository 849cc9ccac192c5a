package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-gate sampling — the sampling a training-data
  * pipeline actually needs, which `df.sample()` (rand()-per-row) cannot
  * provide:
  *
  *   - **Reproducible**: membership is a pure function of (key, seed) —
  *     the same sample on every run, every engine, every partitioning.
  *     `rand()`-based sampling changes under retries, AQE re-plans, or a
  *     different partition count; a lineage-level nondeterminism at scale.
  *   - **Nested**: the gate is `bucket(key) < fraction·SCALE`, so the 1%
  *     sample is a SUBSET of the 10% sample is a subset of the 50% sample
  *     — exactly what scaling-law ladders and progressive training mixes
  *     need (SamplingSpec pins the monotonicity).
  *   - **Complementable**: `bucket >= threshold` is the exact held-out
  *     complement; [[hashSplit]] carves disjoint-and-exhaustive
  *     train/val/test from one hash.
  *   - **Scan-speed**: the gate is a scalar predicate in whole-stage
  *     codegen riding the scan — no shuffle, no sampling operator, no
  *     state; a mixture is a union of gated scans.
  *
  * Buckets are uniform on [0, SCALE): realized fractions deviate from the
  * target like any Bernoulli sample (±~1/√n), they are never exact counts
  * — use exact top-n-per-stratum when a hard count is required.
  *
  * `algo` follows the engine's SimHash convention: "xxh64" (codegen'd
  * xxHash64, production default) or "md5" (bit-identical in any engine
  * with md5 — the differential-oracle path; same 60-bit-hex construction
  * as Dedup.hashedShingles).
  */
object Sampling {

  /** Bucket resolution: fractions are honored to 1e-6. */
  val Scale = 1000000L

  /** Uniform bucket in [0, Scale) as a pure function of (key, seed). */
  def bucket(key: Column, seed: String, algo: String = "xxh64"): Column =
    algo match {
      case "xxh64" =>
        pmod(xxhash64(key.cast("string"), lit(seed)), lit(Scale))
      case "md5" =>
        conv(substring(md5(concat(key.cast("string"), lit(":" + seed))), 1, 15),
          16, 10).cast("long") % Scale
      case other => throw new IllegalArgumentException(
        s"algo must be xxh64 or md5, got $other")
    }

  /** The membership predicate: true for ≈`fraction` of keys. */
  def gate(key: Column, fraction: Double, seed: String,
           algo: String = "xxh64"): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    bucket(key, seed, algo) < math.round(fraction * Scale)
  }

  /** Keep ≈`fraction` of rows, deterministically by `key`. Rows sharing a
    * key (e.g. all chunks of one document) are kept or dropped TOGETHER —
    * sample by the unit that must stay intact. */
  def sample(df: DataFrame, key: Column, fraction: Double, seed: String,
             algo: String = "xxh64"): DataFrame =
    df.where(gate(key, fraction, seed, algo))

  /** Per-stratum fractions (e.g. downsample the over-represented
    * language); strata absent from the map keep `defaultFraction`. */
  def stratified(df: DataFrame, key: Column, strata: Column,
                 fractions: Map[String, Double], defaultFraction: Double,
                 seed: String, algo: String = "xxh64"): DataFrame = {
    (fractions.values ++ Seq(defaultFraction)).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction $f"))
    val threshold = fractions.foldLeft(lit(math.round(defaultFraction * Scale))) {
      case (acc, (value, f)) =>
        when(strata === value, lit(math.round(f * Scale))).otherwise(acc)
    }
    df.where(bucket(key, seed, algo) < threshold)
  }

  /** Disjoint, exhaustive split by consecutive bucket ranges: every row
    * gets exactly one label, fractions must sum to 1 (±1e-9). The labels
    * are stable under any future re-run or re-partitioning — the property
    * that keeps test data OUT of training data forever. */
  def hashSplit(df: DataFrame, key: Column, splits: Seq[(String, Double)],
                labelCol: String, seed: String,
                algo: String = "xxh64"): DataFrame = {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val bounds = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * Scale)
    }.tail
    val b = bucket(key, seed, algo)
    // Last range is open-ended so rounding can never orphan bucket
    // Scale-1: the final label is the ELSE branch.
    val label = splits.init.zip(bounds.init).reverse
      .foldLeft(lit(splits.last._1): Column) { case (acc, ((name, _), hi)) =>
        when(b < hi, name).otherwise(acc)
      }
    df.withColumn(labelCol, label)
  }

  /** Weighted corpus mixture: per-source hash gates + a provenance tag,
    * unioned. Seeds are salted per tag so one corpus's sampling decisions
    * never correlate with another's (matters when corpora overlap). The
    * plan is a union of gated scans — zero shuffles, each source pruned
    * and filtered independently. */
  def mixture(sources: Seq[(String, DataFrame, Double)], key: Column,
              tagCol: String, seed: String,
              algo: String = "xxh64"): DataFrame = {
    require(sources.nonEmpty, "mixture of zero sources")
    sources.map { case (tag, df, fraction) =>
      sample(df, key, fraction, s"$seed:$tag", algo)
        .withColumn(tagCol, lit(tag))
    }.reduce(_ unionByName _)
  }

  /** K-fold assignment: fold i = `bucket(key) mod k` — deterministic,
    * disjoint, exhaustive, and independent of [[hashSplit]]'s range-based
    * labels under a different seed (mod distributes the SAME uniform
    * bucket orthogonally to `<threshold` ranges only across seeds, so
    * always salt the fold seed). Folds are ≈n/k ± Bernoulli like every
    * hash gate; use the complement `fold =!= i` as the training mask. */
  def kFold(df: DataFrame, key: Column, k: Int, foldCol: String,
            seed: String, algo: String = "xxh64"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.withColumn(foldCol, bucket(key, seed, algo) % k)
  }

  /** EXACT-count deterministic sample: the `n` rows per group whose hash
    * ranks smallest — the hard-count complement to the Bernoulli hash
    * gates above (eval sets, per-domain caps, "exactly 1000 docs per
    * language" curation quotas, where ±1/√n drift is not acceptable).
    *
    * Determinism contract: the rank order is (hash(key, seed), key) — a
    * TOTAL order whenever `key` is unique within its group (the same
    * uniqueness every keyed operator here assumes), so membership is a
    * pure function of the group's key set and the seed: stable under
    * re-partitioning, retries, and engine choice (md5 algo). Unlike the
    * gates it is NOT nested across n and NOT scan-speed — the rank needs
    * one shuffle on `groups`.
    *
    * Scale: one window per group; groups are the unit of parallelism and
    * the per-task cost is the group's size. A pathologically hot group
    * sorts in one task — cap it upstream with a coarse hash gate first
    * (gate to ~10·n expected, then rank exactly), the two-stage shape of
    * [[graft.functions.TopKAggregator]]. */
  def sampleNPerGroup(df: DataFrame, groups: Seq[String], key: Column,
                      n: Int, seed: String,
                      algo: String = "xxh64"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"n must be >= 1, got $n")
    require(!df.columns.contains("__rk"), "reserved column name __rk in input")
    val h = algo match {
      case "xxh64" => xxhash64(key.cast("string"), lit(seed))
      case "md5" =>
        conv(substring(md5(concat(key.cast("string"), lit(":" + seed))), 1, 15),
          16, 10).cast("long")
      case other => throw new IllegalArgumentException(
        s"algo must be xxh64 or md5, got $other")
    }
    df.withColumn("__rk", row_number().over(
        Window.partitionBy(groups.map(col): _*)
          .orderBy(h, key.cast("string"))))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Temperature-scaled domain rebalancing — the multilingual-pretraining
    * sampler (exponentiated-count mixing, XLM-R style): domain i keeps
    * enough rows that its share of the output follows
    * `q_i = n_i^α / Σ_j n_j^α` instead of its raw share, flattening the
    * head without deleting the tail; `targetFraction` sets the output
    * size as a fraction of the input. Per-domain keep-fraction
    * `f_i = min(1, targetFraction·N·q_i / n_i)` feeds the same
    * deterministic [[stratified]] hash gate as every other sampler here.
    *
    * Two-job shape, scale-safe: job 1 is one tiny aggregate (one row per
    * domain — thousands at 100 TB); the fractions are derived driver-side
    * by a fold in lexicographic domain order (the IVF-seeding convention:
    * O(domains) driver work, corpus-size-independent) so the float sum
    * `Σ√n` has ONE defined operation order any engine can replay; job 2
    * is the scan-speed gate. α is 0.5 by default — `sqrt` is
    * correctly-rounded under IEEE 754 in every engine, so the entire
    * weight computation is bit-reproducible (general `pow` is not
    * guaranteed correctly rounded; other α values are fine in production
    * but excluded from the differential oracle). Domains with
    * f_i ≥ 1 keep everything — the tail-preservation property. */
  def temperatureMixture(df: DataFrame, key: Column, domain: Column,
                         targetFraction: Double, seed: String,
                         alpha: Double = 0.5,
                         algo: String = "xxh64",
                         maxDomains: Int = 100000): DataFrame = {
    require(targetFraction > 0.0 && targetFraction <= 1.0,
      s"targetFraction $targetFraction")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha")
    require(maxDomains >= 1, s"maxDomains $maxDomains")
    def w(c: Long): Double =
      if (alpha == 0.5) math.sqrt(c.toDouble) else math.pow(c.toDouble, alpha)
    // NULL domains are excluded from the weight computation AND gated out
    // (defaultFraction 0 below) — same drop convention as an
    // absent-after-count stratum, and the collect cannot NPE on toString
    // UTF-8 byte order, not Java's UTF-16 code-unit order: "lexicographic
    // domain order" must mean the same thing to an engine replaying it
    // (ORDER BY on bytes) — the two diverge for supplementary-plane
    // characters, and a different fold order changes wsum's last ulps
    val utf8Order: Ordering[String] = (a: String, b: String) =>
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the per-domain weight table is DRIVER-RESIDENT by design (a mixture
    // is defined over a bounded domain set — language, source, license);
    // the limit caps the transfer so pathological cardinality (someone
    // passing a free-text column as `domain`) fails LOUD below instead of
    // OOMing the driver
    val counts = df.filter(domain.isNotNull)
      .groupBy(domain.as("__dom")).count()
      .limit(maxDomains + 1)
      .collect().map(r => r.get(0).toString -> r.getLong(1))
      .sortBy(_._1)(utf8Order)
    require(counts.length <= maxDomains,
      s"temperatureMixture saw more than $maxDomains distinct domains — " +
        "the domain column looks unbounded (free text? an id?); pass a " +
        "true mixture dimension, or raise maxDomains deliberately")
    require(counts.nonEmpty, "temperatureMixture over an empty frame")
    val n = counts.map(_._2).sum
    val wsum = counts.foldLeft(0.0) { case (a, (_, c)) => a + w(c) }
    val budget = targetFraction * n
    val fracs = counts.map { case (d, c) =>
      d -> math.min(1.0, budget * (w(c) / wsum) / c.toDouble)
    }.toMap
    // absent stratum ⇒ 0.0: a domain that appeared after the count pass
    // is dropped rather than silently over-sampled at some default rate
    stratified(df, key, domain, fracs, defaultFraction = 0.0, seed, algo)
  }

  /** Weighted sampling, Poisson-PPS form (round 9): each row is kept
    * independently with probability min(1, k·w/W) — expected sample
    * size k, inclusion probability proportional to weight. This is the
    * 100 TB path: ONE long-sum aggregate for W (exact, order-free),
    * then a MAP-ONLY gate `bucket(key) < p·Scale` — no global sort, no
    * top-k shuffle, and fully deterministic (the hash bucket is exact
    * integer arithmetic; p is a fixed chain of IEEE ops on
    * exactly-derived operands — no `pow`, the temperatureMixture
    * lesson). Rows with null/non-positive weight are excluded (they
    * have no well-defined inclusion probability).
    *
    * For EXACT sample size use [[weightedTopK]] (A-Res) — at the cost
    * of a top-k reduction and a `pow` that keeps it out of the
    * cross-engine oracle. */
  def ppsSample(df: DataFrame, key: Column, weight: Column, k: Int,
                seed: String, algo: String = "xxh64"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // micro-unit quantization on BOTH sides of the ratio: W is an exact
    // integer sum of round(w·1e6) and the numerator uses the SAME
    // quantized weight, so fractional weights are honored to 1e-6 grain
    // instead of truncating to 0 in the denominator while counting full
    // in the numerator (which biased p for non-integer weights). For
    // integer weights the quotient is bit-identical to k·w/W — numerator
    // and denominator are both scaled by an exact 1e6.
    val wMicro = round(weight.cast("double") * lit(1e6)).cast("long")
    val eligible = df.filter(weight.isNotNull && weight > 0)
    val tot = eligible.agg(sum(wMicro).as("__w_total"))
    eligible.crossJoin(broadcast(tot))
      .withColumn("p", least(lit(1.0),
        (lit(k.toDouble) * wMicro.cast("double")) /
          col("__w_total").cast("double")))
      .filter(bucket(key, seed, algo).cast("double") < col("p") * Scale)
      .drop("__w_total")
  }

  /** Weighted sampling WITHOUT replacement, exact size k — the
    * Efraimidis–Spirakis A-Res reservoir: es_key = u^(1/w) with u a
    * deterministic 60-bit hash uniform in (0,1], take the k largest.
    * Distributed as per-partition top-k merged on the driver
    * (TakeOrderedAndProject — never a global sort). `pow` is not
    * correctly-rounded-guaranteed across engines, so this variant is
    * spec-pinned rather than oracle-paired; [[ppsSample]] is the
    * oracle-clean sibling. */
  def weightedTopK(df: DataFrame, key: Column, weight: Column, k: Int,
                   seed: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // 60-bit md5 uniform — finer than bucket()'s 1e6 grid so es_key ties
    // are hash collisions (2^-60), not grid collisions
    val v = conv(substring(md5(concat(key.cast("string"), lit(":" + seed))),
      1, 15), 16, 10).cast("long")
    val u = (v.cast("double") + lit(1.0)) / lit(math.pow(2.0, 60))
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("es_key", pow(u, lit(1.0) / weight.cast("double")))
      .orderBy(col("es_key").desc, key.asc)
      .limit(k)
  }

  /** Cumulative Poisson(1) CDF on the [[bucket]] grid (CDF(k)·Scale for
    * k = 0..7, rounded): the inverse-CDF table [[poissonBootstrap]] draws
    * deterministic per-(row, replicate) weights from. Shared with the
    * generated DuckDB oracle so the two engines can never drift. P(w > 8)
    * ≈ 1e-5 is truncated to 8 — the standard bounded-weight variant. */
  private[graft] val PoissonCdfMicro: Seq[Long] = {
    var fact = 1.0
    val pmf = (0 to 7).map { k =>
      if (k > 0) fact *= k
      math.exp(-1.0) / fact
    }
    pmf.scanLeft(0.0)(_ + _).tail.map(c => math.round(c * Scale))
  }

  /** Type-1 order-statistic ranks of the 2.5%/97.5% bootstrap interval
    * for `replicates` replicate means (rank ceil(p·B) — interpolated
    * quantiles are not hash-pairable, the ft_quantile_bins lesson). */
  private[graft] def bootstrapRanks(replicates: Int): (Int, Int) =
    (math.ceil(0.025 * replicates).toInt, math.ceil(0.975 * replicates).toInt)

  /** Poisson bootstrap confidence intervals for per-group means (round
    * 9) — THE bootstrap that works on a cluster (Chamandy et al. 2012,
    * "Estimating uncertainty for massive data streams"): instead of
    * resampling n rows WITH replacement B times (which needs global
    * coordination per replicate), every row independently draws a
    * Poisson(1) weight per replicate — the multinomial resample's limit —
    * so the whole procedure is ONE map-only fan-out (×B, a broadcast
    * cross join against the replicate-id range — no per-row array
    * allocation) followed by ONE aggregate. No row ever leaves its
    * partition before the (group, replicate) combine.
    *
    * Determinism (the cross-engine contract): the uniform for (row, b)
    * is a 40-BIT SLICE of md5("key:⌊b/3⌋:seed") — one md5 serves three
    * replicates (slice b mod 3: hex chars 1-10 / 11-20 / 21-30), cutting
    * the dominant hash cost 3× (measured: the per-(row, replicate) md5
    * was the whole row's bench cost); 40 bits mod the 1e6 [[bucket]]
    * grid leaves ~1e-6 modulo bias, statistically invisible. The weight
    * is the inverse-CDF table [[PoissonCdfMicro]] applied to that
    * uniform — a pure function any engine re-derives. Replicate means
    * are exact integer micro-unit sums with ONE fixed (Σwv/Σw)/1e6
    * double chain; the CI bounds are type-1 order statistics of the B
    * replicate means at ranks [[bootstrapRanks]], ties broken by
    * replicate id — total order, bit-stable.
    *
    * Output: `(group…, n, mean, ci_lo, ci_hi)`. A replicate whose total
    * weight lands at 0 is dropped (possible only for tiny groups,
    * P ≈ e^−n); if that pushes the hi rank past the surviving count the
    * bound reads NULL — loud, not silently shifted. */
  def poissonBootstrap(df: DataFrame, group: Seq[String], key: Column,
                       value: Column, replicates: Int,
                       seed: String): DataFrame = {
    require(replicates >= 4 && replicates <= 1000,
      s"replicates must be in [4,1000], got $replicates")
    val (loRank, hiRank) = bootstrapRanks(replicates)
    val gc = group.map(col)
    val base = df.filter(value.isNotNull && key.isNotNull)
      .withColumn("__v", round(value * lit(1e6)).cast("long"))
    val full = base.groupBy(gc: _*)
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("__sv"))
      .withColumn("mean",
        col("__sv").cast("double") / col("n").cast("double") / lit(1e6))
      .drop("__sv")
    val wCol = PoissonCdfMicro
      .map(t => when(col("__u") >= t, lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    // fan out by HASH GROUP g = ⌊b/3⌋ first so each md5 is computed once
    // and genuinely serves its three replicates (slicing per (row, b)
    // would re-hash per replicate — measured as the row's whole cost),
    // then explode the three 40-bit slices into replicate ids
    val nGroups = (replicates + 2) / 3
    val gFrame = df.sparkSession.range(nGroups)
      .select(col("id").cast("int").as("__g"))
    val baseCols = base.columns.map(col).toSeq
    // Fan-out parallelism floor (round 16, guide §2.5 input skew): a
    // small single-row-group parquet input scans as ONE split, and the
    // whole md5 fan-out (rows × ⌈B/3⌉ hashes, × B weight rows) then runs
    // on one core before the first exchange — measured as the row's
    // entire cost at bench scale. Hash-repartition the narrow base by
    // `key` up to cluster width BEFORE attaching replicate groups (the
    // §8 rule: shuffle the light rows, explode after). When the scan is
    // already at least cluster-wide — any real at-scale input — this is
    // a no-op, so no extra exchange exists at 100 TB.
    val defaultPar = df.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (base.rdd.getNumPartitions < defaultPar)
        base.repartition(defaultPar, key)
      else base
    val reps = spread
      .crossJoin(broadcast(gFrame))
      .withColumn("__h", md5(concat_ws(":", key.cast("string"),
        col("__g"), lit(seed))))
      .select(baseCols :+ col("__g") :+
        posexplode(array(substring(col("__h"), 1, 10),
          substring(col("__h"), 11, 10),
          substring(col("__h"), 21, 10))).as(Seq("__s", "__hex")): _*)
      .withColumn("__b", col("__g") * 3 + col("__s"))
      .filter(col("__b") < replicates)
      .withColumn("__u", conv(col("__hex"), 16, 10).cast("long") % lit(Scale))
      .withColumn("__w", wCol)
      .groupBy(gc :+ col("__b"): _*)
      .agg(sum(col("__w") * col("__v")).as("__swv"),
        sum(col("__w")).as("__sw"))
      .filter(col("__sw") > 0)
      .withColumn("mean_b",
        col("__swv").cast("double") / col("__sw").cast("double") / lit(1e6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gc: _*).orderBy(col("mean_b"), col("__b"))
    val ci = reps.withColumn("__rn", row_number().over(w))
      .groupBy(gc: _*)
      .agg(max(when(col("__rn") === loRank, col("mean_b"))).as("ci_lo"),
        max(when(col("__rn") === hiRank, col("mean_b"))).as("ci_hi"))
    full.join(ci, group)
      .select(gc :+ col("n") :+ col("mean") :+ col("ci_lo") :+ col("ci_hi"): _*)
  }

  /** Deterministic training-epoch shuffle: a FULL-RANGE hash of
    * (key, seed) as `shuffle_key` — reproducible global data order per
    * epoch seed, independent across seeds, stable under repartitioning
    * (everything [[bucket]] promises, at 60+-bit resolution instead of
    * the 1e-6 gate grain, because a total ORDER needs far fewer
    * collisions than a membership gate tolerates). Epoch materialization
    * is `orderBy(shuffle_key, key)` — a range-partitioned distributed
    * sort, NOT a single-partition window; an explicit epoch_rank column
    * is the caller's optional extra and carries the W5 global-window
    * price where exactness demands it. */
  def epochShuffle(df: DataFrame, key: Column, seed: String,
                   algo: String = "xxh64"): DataFrame = {
    val h = algo match {
      case "xxh64" => xxhash64(key.cast("string"), lit(seed))
      case "md5" =>
        conv(substring(md5(concat(key.cast("string"), lit(":" + seed))), 1, 15),
          16, 10).cast("long")
      case other => throw new IllegalArgumentException(
        s"algo must be xxh64 or md5, got $other")
    }
    df.withColumn("shuffle_key", h).orderBy(col("shuffle_key"), key)
  }

  /** Greedy selection under a total weight budget (the token-budget
    * corpus cut every mixture recipe ends with: "the best documents up
    * to B training tokens"): rows are taken in (priority DESC, id)
    * order — a caller-supplied TOTAL order, quality score or seeded
    * lottery hash alike — until the running weight sum would pass
    * `budget`. Exports the running sum and the verdict as DATA
    * (`cum_weight`, `selected` — the snk3 mode-as-data pattern), so an
    * oracle re-derives the exact boundary: the first row to CROSS the
    * budget is excluded, rows after it too (no best-fit backfill —
    * greedy prefix, the deterministic contract).
    *
    * Scale: the global ordered cumulative sum is the W5 exactness
    * price. At corpus scale, partition by mixture source and budget
    * each partition (the usual recipe), or cut at a priority THRESHOLD
    * from a weighted quantile sketch (the lmPerplexityThresholds
    * shape) and pay only one aggregate. */
  def selectWithinBudget(df: DataFrame, priority: Column, weight: Column,
                         id: Column, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(priority.desc, id)
    df.withColumn("cum_weight", sum(weight).over(w))
      .withColumn("selected", col("cum_weight") <= budget)
  }
}
