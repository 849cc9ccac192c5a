package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association-rule mining (Agrawal & Srikant 1994's
  * apriori, at the pairwise level that covers the overwhelming share of
  * production use): from a (basket, item) relation, find directed rules
  * A → B with
  *   support(A,B)   = #baskets containing both,
  *   confidence(A→B) = support(A,B) / #baskets containing A,
  *   lift(A→B)      = N·support(A,B) / (#A · #B) ,
  * the "customers who bought X also bought Y" workload — and, for a
  * training-data pipeline, the token/tag co-occurrence miner (documents
  * as baskets, entities as items).
  *
  * Exactness: every statistic is an integer count; the confidence
  * threshold is applied by INTEGER CROSS-MULTIPLICATION
  * (1000·n_pair ≥ minConfMilli·n_ante — no division ever participates in
  * a comparison), and the exported confidence/lift are each ONE
  * exactly-rounded IEEE division of exact integers — hash-stable
  * cross-engine, the a18/ft_quantile_bins lesson applied to rule mining.
  *
  * Scale shape: the pair self-join is the textbook hazard — it explodes
  * Σ C(basket_size, 2) candidate rows. Two standard bounds keep it sane:
  * (a) the APRIORI PRUNE — an item appearing in < minSupport baskets
  * cannot be in any qualifying pair, so baskets are semi-joined to
  * frequent items BEFORE pairing (on long-tailed item domains this drops
  * most of the explosion); (b) pathological mega-baskets should be
  * capped upstream (a basket of 10⁵ items contributes 5·10⁹ pairs — cap
  * or salt by the caller's domain rule, the hotKeys template). All joins
  * are equi-joins on basket/item keys; the item-count side is |items|
  * rows (AQE broadcasts it); nothing collects to the driver.
  */
object Association {

  /** Directed pairwise rules over `baskets(basketCol, itemCol)`.
    * Output: `(antecedent, consequent, n_pair, n_ante, n_cons,
    * n_baskets, confidence, lift)`, one row per direction of each
    * qualifying pair — support ≥ `minSupport` AND
    * confidence ≥ minConfMilli/1000 (the integer-milli encoding keeps
    * the gate exact).
    *
    * `maxPairBudget` is the LOUD scale guard (the jaccardPairs
    * `maxRows` contract, Dedup.scala): before pairing, ONE cheap agg
    * job computes Σ C(size, 2) over the POST-PRUNE baskets — the exact
    * row count the self-join will emit — and the call fails with a
    * diagnostic if it exceeds the budget. A silently-exploding pair
    * join is the one failure mode of this operator at corpus scale;
    * the guard turns it into an error naming the offending estimate
    * and the knobs (raise minSupport, cap mega-baskets upstream, or
    * pass a deliberate larger budget). */
  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
                minSupport: Long, minConfMilli: Long,
                maxPairBudget: Long = 100000000L): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(minConfMilli >= 0 && minConfMilli <= 1000,
      s"minConfMilli must be in [0,1000], got $minConfMilli")
    require(maxPairBudget >= 1,
      s"maxPairBudget must be >= 1, got $maxPairBudget")
    rulesOverDeduped(dedupedBaskets(baskets, basketCol, itemCol),
      minSupport, minConfMilli, maxPairBudget)
  }

  /** The cleaned, de-duplicated, PERSISTED (bk, it) relation every
    * aggregate below reads — built exactly once per mining call; every
    * later pass is a cache read, never a re-run of the caller's basket
    * pipeline (round 17, guide §2.4: the relative-support pre-flight
    * used to re-execute the whole basket build a second time). */
  private def dedupedBaskets(baskets: DataFrame, basketCol: String,
                             itemCol: String): DataFrame =
    baskets
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  private def rulesOverDeduped(b: DataFrame, minSupport: Long,
                               minConfMilli: Long,
                               maxPairBudget: Long): DataFrame = {
    val nBaskets = b.agg(count_distinct(col("bk")).as("n_baskets"))
    val itemCounts = b.groupBy(col("it")).agg(count(lit(1)).as("ni"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // apriori prune: only frequent items can form a frequent pair
    val frequent = itemCounts.filter(col("ni") >= minSupport)
      .select(col("it"))
    val bf = b.join(frequent, "it").select(col("bk"), col("it"))
    // exact pair-count pre-flight: Σ C(sz, 2) over post-prune baskets
    val budget = bf.groupBy(col("bk")).agg(count(lit(1)).as("sz"))
      .agg(coalesce(sum(col("sz") * (col("sz") - 1)), lit(0L)))
      .head().getLong(0) / 2
    require(budget <= maxPairBudget,
      s"pairRules would emit $budget candidate pairs after the apriori " +
        s"prune (minSupport=$minSupport) > maxPairBudget=$maxPairBudget. " +
        "Raise minSupport, cap mega-baskets upstream (a 10^5-item basket " +
        "alone contributes 5*10^9 pairs), or pass maxPairBudget " +
        "explicitly for a deliberate large run.")
    val pairs = bf.select(col("bk"), col("it").as("i1"))
      .join(bf.select(col("bk"), col("it").as("i2")), "bk")
      .filter(col("i1") < col("i2"))
      .groupBy(col("i1"), col("i2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSupport)
    val directed = pairs
      .select(col("i1").as("antecedent"), col("i2").as("consequent"),
        col("n_pair"))
      .unionByName(pairs.select(col("i2").as("antecedent"),
        col("i1").as("consequent"), col("n_pair")))
    directed
      .join(itemCounts.select(col("it").as("antecedent"),
        col("ni").as("n_ante")), "antecedent")
      .join(itemCounts.select(col("it").as("consequent"),
        col("ni").as("n_cons")), "consequent")
      // exact integer confidence gate: n_pair/n_ante >= minConfMilli/1000
      .filter(col("n_pair") * lit(1000L) >= col("n_ante") * lit(minConfMilli))
      .crossJoin(nBaskets)
      .select(col("antecedent"), col("consequent"), col("n_pair"),
        col("n_ante"), col("n_cons"), col("n_baskets"),
        (col("n_pair").cast("double") / col("n_ante").cast("double"))
          .as("confidence"),
        ((col("n_pair") * col("n_baskets")).cast("double") /
          (col("n_ante") * col("n_cons")).cast("double")).as("lift"))
  }

  /** [[pairRules]] with RELATIVE support — the classic apriori
    * formulation (support as a fraction of baskets), and the only form
    * whose prune behavior is SCALE-INVARIANT: an absolute threshold
    * that prunes at sf0.01 is a no-op at sf1 (every item's count grew
    * 100×), while `minSupportMilli`/1000 of n_baskets prunes the same
    * relative tail at every scale. One cheap count-distinct pre-flight
    * derives the absolute threshold ceil(milli·n_baskets/1000) — pure
    * integer arithmetic, so the gate is exactly 1000·n ≥ milli·n_baskets
    * — then delegates to [[pairRules]] (which recomputes the identical
    * n_baskets for the lift column). */
  def pairRulesRel(baskets: DataFrame, basketCol: String, itemCol: String,
                   minSupportMilli: Long, minConfMilli: Long,
                   maxPairBudget: Long = 100000000L): DataFrame = {
    require(minSupportMilli >= 1 && minSupportMilli <= 1000,
      s"minSupportMilli must be in [1,1000], got $minSupportMilli")
    require(minConfMilli >= 0 && minConfMilli <= 1000,
      s"minConfMilli must be in [0,1000], got $minConfMilli")
    require(maxPairBudget >= 1,
      s"maxPairBudget must be >= 1, got $maxPairBudget")
    // ONE basket-build pass (round 17, guide §2.4): the pre-flight
    // count fills the SAME persisted relation every later aggregate
    // reads. The previous shape counted distinct baskets over the RAW
    // relation first — distinct bk over deduped (bk, it) pairs is the
    // identical number (same null filter, projection before distinct) —
    // and then re-ran the caller's whole basket pipeline (JSON parse,
    // union, distinct shuffle) a second time inside pairRules.
    val b = dedupedBaskets(baskets, basketCol, itemCol)
    val nB = b.agg(count_distinct(col("bk"))).head().getLong(0)
    val threshold = math.max(1L, (minSupportMilli * nB + 999L) / 1000L)
    rulesOverDeduped(b, threshold, minConfMilli, maxPairBudget)
  }

  /** The apriori prune's effect AS DATA — one row
    * `(n_baskets, n_items, n_frequent, n_pruned, pairs_before,
    * pairs_after)` where pairs_before/after are the exact Σ C(size, 2)
    * pair-join cardinalities without/with the prune at the SAME
    * relative threshold [[pairRulesRel]] applies. This is the
    * registration-audit evidence that a production support setting
    * actually defends the pair join (a threshold where
    * n_pruned = 0 and pairs_after = pairs_before means the prune is
    * decorative — the round-11 mb_assoc_rules lesson). */
  def pruneStats(baskets: DataFrame, basketCol: String, itemCol: String,
                 minSupportMilli: Long): DataFrame = {
    require(minSupportMilli >= 1 && minSupportMilli <= 1000,
      s"minSupportMilli must be in [1,1000], got $minSupportMilli")
    val b = baskets
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nb = b.agg(count_distinct(col("bk")).as("n_baskets"))
    val ic = b.groupBy(col("it")).agg(count(lit(1)).as("ni"))
    val itemStats = ic.crossJoin(nb).agg(
      first(col("n_baskets")).as("n_baskets"),
      count(lit(1)).as("n_items"),
      sum(when(col("ni") * 1000L >= col("n_baskets") * minSupportMilli, 1L)
        .otherwise(0L)).as("n_frequent"))
    // both Σ C(sz,2) cardinalities in ONE basket-keyed pass: tag each
    // (bk, it) row with its item's frequent flag (broadcast — |items|
    // rows), count per basket with and without the prune, then one
    // two-column aggregate — vs the naive two independent pair-sum
    // scans (this row is a stats probe; it should not cost two extra
    // passes over the basket relation)
    val flagged = b.join(
      broadcast(ic.crossJoin(nb)
        .select(col("it"),
          (col("ni") * 1000L >= col("n_baskets") * minSupportMilli)
            .as("freq"))), "it")
    val pairSums = flagged.groupBy(col("bk")).agg(
        count(lit(1)).as("sz"),
        sum(when(col("freq"), 1L).otherwise(0L)).as("szf"))
      .agg(
        (coalesce(sum(col("sz") * (col("sz") - 1)), lit(0L)) / lit(2L))
          .cast("long").as("pairs_before"),
        (coalesce(sum(col("szf") * (col("szf") - 1)), lit(0L)) / lit(2L))
          .cast("long").as("pairs_after"))
    itemStats
      .withColumn("n_pruned", col("n_items") - col("n_frequent"))
      .crossJoin(pairSums)
      .select(col("n_baskets"), col("n_items"), col("n_frequent"),
        col("n_pruned"), col("pairs_before"), col("pairs_after"))
  }
}
