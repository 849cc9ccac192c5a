package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge-list frames. Companion to the
  * connected-components operator in [[Dedup]] (large/small-star over
  * near-dup pairs); this file carries the rank-propagation side.
  *
  * Scale shape: everything is joins + aggregates on the edge list —
  * no driver-resident adjacency, no vertex collect. Each PageRank
  * iteration is ONE shuffle join (ranks ⋈ edges on src, the rank side
  * |V| rows) and ONE aggregate (contributions by dst); out-weights are
  * computed once and reused. Iterations chain lazily — for iteration
  * counts beyond ~10 insert a checkpoint per round (the
  * Dedup.connectedComponents lineage lesson); the fixed small counts
  * used here don't need one.
  */
object Graph {

  /** Damped PageRank over a weighted directed edge list `(src, dst, w)`,
    * fixed iteration count:
    *   r₀ = 1/N;  rₜ₊₁(v) = d · Σ_{(u,v)} rₜ(u) · w(u,v)/outw(u) + (1−d)/N
    * Dangling mass (nodes with no out-edges) is dropped, the common
    * sparse-graph simplification — ranks then sum to < 1, which is fine
    * for ranking use.
    *
    * Determinism (the cross-engine-oracle contract): each edge's
    * contribution is a fixed IEEE chain `rank · (w/outw)` on
    * identically-derived doubles, quantized to BIGINT 1e-15 units
    * (round is half-away-from-zero in both engines and contributions
    * are non-negative) so the per-node reduction is an EXACT integer
    * sum — a double→DECIMAL(27,18) cast is NOT bitwise-portable
    * (DuckDB scales through double arithmetic; this one-ulp hazard was
    * measured, not theorized), but round-to-integer of the same double
    * is. The damping update is a fixed chain again. The only
    * driver-side value is the scalar node count. Quantization bounds
    * the rank error at 1e-15·in-degree — ranking-irrelevant. */
  def pageRank(edges: DataFrame, damping: Double, iters: Int): DataFrame = {
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1): $damping")
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50]: $iters")
    // nodes and the out-weighted edge list are read EVERY iteration —
    // persist both or each round re-derives the full upstream lineage
    // (measured: 3 iterations = 3 re-scans without this). MEMORY_AND_DISK
    // so a 100 TB-derived edge list spills instead of OOMing.
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // ONE scalar to the driver, never row data
    require(n > 0, "pageRank over an empty edge list")
    val r0 = 1.0 / n
    val outw = edges.groupBy(col("src"))
      .agg(sum(col("w").cast("long")).as("ow"))
    val edgesN = edges.join(outw, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.withColumn("rank", lit(r0))
    for (_ <- 1 to iters) {
      val contribs = edgesN.join(ranks, col("src") === col("id"))
        .select(col("dst"),
          round((col("rank") *
            (col("w").cast("double") / col("ow").cast("double"))) * lit(1e15))
            .cast("long").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
      ranks = nodes.join(contribs, nodes("id") === contribs("dst"), "left")
        .select(col("id"),
          (lit(damping) * (coalesce(col("cs"), lit(0L)).cast("double") / lit(1e15)) +
            lit(1.0 - damping) * lit(r0)).as("rank"))
    }
    ranks
  }
}
