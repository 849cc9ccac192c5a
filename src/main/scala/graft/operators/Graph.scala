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
    // out-weight in 1e-6 micro-units on BOTH sides of the w/outw ratio:
    // a long-truncated denominator against a full-double numerator lets
    // fractional edge weights leak rank mass (ratios no longer sum to 1
    // per node). round(w·1e6) keeps the sum an exact deterministic
    // integer; for integer weights the quotient is bit-identical to the
    // unscaled w/Σw (both operands exactly ×1e6).
    val outw = edges.groupBy(col("src"))
      .agg(sum(round(col("w").cast("double") * lit(1e6)).cast("long")).as("ow"))
    val edgesN = edges.join(outw, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.withColumn("rank", lit(r0))
    for (it <- 1 to iters) {
      val contribs = edgesN.join(ranks, col("src") === col("id"))
        .select(col("dst"),
          round((col("rank") *
            (round(col("w").cast("double") * lit(1e6))
              / col("ow").cast("double"))) * lit(1e15))
            .cast("long").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
      ranks = nodes.join(contribs, nodes("id") === contribs("dst"), "left")
        .select(col("id"),
          (lit(damping) * (coalesce(col("cs"), lit(0L)).cast("double") / lit(1e15)) +
            lit(1.0 - damping) * lit(r0)).as("rank"))
      // bounded plan depth on long runs: cut the rank lineage every 5
      // rounds (values unchanged — checkpointing never rewrites rows;
      // reliable when a checkpoint dir is set, executor-local otherwise)
      if (it % 5 == 0 && it < iters)
        ranks = Checkpointing.cut(ranks, eager = false)
    }
    ranks
  }

  /** Personalized PageRank (round 9) — [[pageRank]] with the teleport
    * mass concentrated on a SOURCE SET instead of spread uniformly:
    *   r₀ = e;  rₜ₊₁(v) = d · Σ_{(u,v)} rₜ(u) · w(u,v)/outw(u) + (1−d)·e(v)
    * with e(v) = 1/|S| for v ∈ S, 0 otherwise — the random walk that
    * restarts AT the sources, i.e. "importance from the perspective of
    * S": the recommendation/similar-items primitive (Pinterest's
    * Pixie-style related-pins walk, done as batch linear algebra).
    * Same determinism contract as [[pageRank]] (fixed IEEE contribution
    * chain, BIGINT 1e-15 quantized reduction, dangling mass dropped);
    * sources absent from the node set are ignored; an empty effective
    * source set fails loud. */
  def personalizedPageRank(edges: DataFrame, sources: DataFrame,
                           damping: Double, iters: Int): DataFrame = {
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1): $damping")
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50]: $iters")
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    val srcSet = nodes.join(sources.select(col("id")).distinct(), "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nS = srcSet.count() // ONE scalar, never row data
    require(nS > 0, "personalizedPageRank: no source appears in the graph")
    val e0 = 1.0 / nS
    val nodesE = nodes
      .join(srcSet.withColumn("__isrc", lit(true)), Seq("id"), "left")
      .select(col("id"),
        when(col("__isrc"), lit(e0)).otherwise(lit(0.0)).as("e"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // micro-unit out-weights, same num/denom quantization as pageRank
    val outw = edges.groupBy(col("src"))
      .agg(sum(round(col("w").cast("double") * lit(1e6)).cast("long")).as("ow"))
    val edgesN = edges.join(outw, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = nodesE.select(col("id"), col("e").as("rank"))
    for (it <- 1 to iters) {
      val contribs = edgesN.join(ranks, col("src") === col("id"))
        .select(col("dst"),
          round((col("rank") *
            (round(col("w").cast("double") * lit(1e6))
              / col("ow").cast("double"))) * lit(1e15))
            .cast("long").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
      ranks = nodesE.join(contribs, nodesE("id") === contribs("dst"), "left")
        .select(col("id"),
          (lit(damping) * (coalesce(col("cs"), lit(0L)).cast("double") / lit(1e15)) +
            lit(1.0 - damping) * col("e")).as("rank"))
      if (it % 5 == 0 && it < iters)
        ranks = Checkpointing.cut(ranks, eager = false)
    }
    ranks
  }

  /** Triangle counting + local clustering coefficient over an UNDIRECTED
    * edge list `(src, dst)` with `src < dst` and no duplicates (the
    * canonical undirected encoding; callers own dedup/orientation, as
    * with [[pageRank]]'s edge contract). Returns one row per node:
    * `(id, degree, triangles, lcc)` where `lcc` = 2·triangles /
    * (degree·(degree−1)) — NULL for degree < 2 (the coefficient is
    * undefined, not zero).
    *
    * Algorithm (Suri & Vassilvitskii 2011's MapReduce node-iterator, the
    * standard distributed shape): orient every edge from its LOWER
    * endpoint to its HIGHER endpoint under the total order
    * (degree, id) — out-degrees are then bounded by O(√m) on any graph
    * (a node of degree d only points at neighbours of degree ≥ d, and
    * there can only be ~√m of those), so wedge generation is
    * Σ C(outdeg, 2) instead of the unbounded Σ C(deg, 2) a hub would
    * cause. Wedges (b < c out of a) probe the oriented edge set with one
    * equi-join; each match is a triangle found EXACTLY ONCE (a is the
    * orientation-minimum of the three). Per-node counts then credit all
    * three corners via one explode + aggregate.
    *
    * Scale: two shuffle joins on edge keys + one aggregate — no driver
    * adjacency, no vertex collect; everything is integer counts, so the
    * cross-engine oracle is exact by construction (the lcc division is
    * ONE exactly-rounded IEEE op on integers, hash-stable). */
  def triangles(edges: DataFrame): DataFrame = {
    // degrees over the undirected list: each edge contributes to both ends
    val deg = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // orient by (degree, id): lower endpoint → higher endpoint
    val ds = deg.select(col("id").as("src"), col("degree").as("dsrc"))
    val dd = deg.select(col("id").as("dst"), col("degree").as("ddst"))
    val oriented = edges.join(ds, "src").join(dd, "dst")
      .select(
        when(col("dsrc") < col("ddst") ||
          (col("dsrc") === col("ddst") && col("src") < col("dst")),
          col("src")).otherwise(col("dst")).as("lo"),
        when(col("dsrc") < col("ddst") ||
          (col("dsrc") === col("ddst") && col("src") < col("dst")),
          col("dst")).otherwise(col("src")).as("hi"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // wedges out of each orientation-minimum corner: pairs (b, c) of
    // out-neighbours, canonicalized b < c so the closing probe is one
    // equi-join against the UNDIRECTED edge set (src < dst — b < c in
    // node order is exactly that encoding, independent of degrees)
    val o1 = oriented.select(col("lo").as("a"), col("hi").as("b"))
    val o2 = oriented.select(col("lo").as("a"), col("hi").as("c"))
    // the self-join emits each unordered out-pair twice ((b,c) and
    // (c,b)); keeping the node-order half b < c both dedups the wedge
    // AND matches the undirected src < dst edge encoding for the probe
    val wedges = o1.join(o2, Seq("a")).filter(col("b") < col("c"))
      .select(col("a"), col("b").as("src"), col("c").as("dst"))
    val tris = wedges.join(edges, Seq("src", "dst"))
      .select(col("a"), col("src").as("b"), col("dst").as("c"))
    // credit all three corners of each triangle
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          (coalesce(col("triangles"), lit(0L)) * lit(2L)).cast("double") /
            (col("degree") * (col("degree") - lit(1L))).cast("double"))
          .as("lcc"))
  }

  /** Bounded-hop BFS distances over an UNDIRECTED edge list `(src, dst)`
    * from a set of source nodes: `(id, dist)` with dist = minimum hop
    * count ≤ `maxHops` (unreached nodes are absent — the caller decides
    * whether absent means "far" or "disconnected"). The frontier-expand
    * shape every distributed BFS uses (Pregel's SSSP specialized to unit
    * weights): each hop joins ONLY the previous frontier against the
    * edge list and min-folds into the distance set — hop h's shuffle is
    * proportional to frontier h's out-edges, not the graph. Distances
    * are exact integers; per-round lazy checkpoints cut the iterative
    * lineage (the connectedComponents lesson). */
  def bfsDistances(edges: DataFrame, sources: DataFrame,
                   maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 50, s"maxHops must be in [1,50]: $maxHops")
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var dist = Checkpointing.cut(
      sources.select(col("id")).distinct()
        .withColumn("dist", lit(0L)), eager = false)
    for (h <- 1 to maxHops) {
      val frontier = dist.filter(col("dist") === (h - 1))
      val next = frontier.join(sym, frontier("id") === sym("u"))
        .select(sym("v").as("id"), lit(h.toLong).as("dist"))
      dist = Checkpointing.cut(
        dist.unionByName(next)
          .groupBy(col("id")).agg(min(col("dist")).as("dist")),
        eager = false)
    }
    dist
  }
}
