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
    * the gate exact). */
  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
                minSupport: Long, minConfMilli: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(minConfMilli >= 0 && minConfMilli <= 1000,
      s"minConfMilli must be in [0,1000], got $minConfMilli")
    val b = baskets
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBaskets = b.agg(count_distinct(col("bk")).as("n_baskets"))
    val itemCounts = b.groupBy(col("it")).agg(count(lit(1)).as("ni"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // apriori prune: only frequent items can form a frequent pair
    val frequent = itemCounts.filter(col("ni") >= minSupport)
      .select(col("it"))
    val bf = b.join(frequent, "it").select(col("bk"), col("it"))
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
}
