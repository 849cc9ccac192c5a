package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Oracle-exact distributed k-means (Lloyd 1982) — the deterministic,
  * cross-engine-reproducible face of the engine's clustering family (the
  * high-dimensional production k-means already lives inside
  * Similarity.buildIvfIndex/PQ codebooks; THIS variant trades dimension
  * count for bit-exact portability, the Graph.pageRank recipe applied to
  * clustering).
  *
  * Determinism contract (every piece re-derivable by any engine):
  *   - seeding: the k lexicographically-smallest DISTINCT feature tuples
  *     (a total order — no RNG, no data-order dependence);
  *   - assignment: argmin of the fixed left-associated IEEE chain
  *     Σ_d (x_d − c_d)² with ties to the smaller cluster id (an exact
  *     total order on (dist², cid));
  *   - update: per-dimension mean from EXACT BIGINT micro-unit sums
  *     (order-free reduction) rendered by one fixed
  *     (Σmicro/n)/1e6 double chain; empty clusters keep their centroid;
  *   - inertia: per-row round(dist²·1e6) BIGINT summed exactly.
  * Every number in the output is therefore bitwise identical in any
  * engine that follows the same chains — the generated unrolled-CTE
  * DuckDB oracle does.
  *
  * Scale shape: one assignment round = a broadcast cross join against
  * the k-row centroid frame + ONE map-side-combined argmin aggregate
  * (min over (dist², cid) structs — no per-row window); one update =
  * ONE k-cell aggregate of integer sums. Nothing driver-side except the
  * k-row centroid frame itself; rounds chain through lazy checkpoints
  * (the funnel/pageRank lineage lesson).
  */
object Clustering {

  /** Run `iters` Lloyd rounds over `features` (p columns) with the
    * contract above, then one FINAL assignment against the last
    * centroids (no update). Returns one row per cluster:
    * `(cluster, n, c_0 … c_{p-1}, inertia)` — counts and inertia from
    * the final assignment, coordinates from the final update. Rows with
    * any NULL feature are excluded. */
  def kmeansLloyd(df: DataFrame, features: Seq[Column], k: Int,
                  iters: Int): DataFrame = {
    require(features.nonEmpty, "kmeansLloyd needs at least one feature")
    require(k >= 1 && k <= 1000, s"k must be in [1,1000], got $k")
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50]: $iters")
    val p = features.indices
    // weighted distinct tuples: duplicate points collapse to one row
    // carrying their multiplicity (the classic weighted-Lloyd compaction
    // — identical rows contribute identical exact integers, so every
    // downstream sum regroups exactly and the per-row oracle agrees)
    val pts = df
      .filter(features.map(_.isNotNull).reduce(_ && _))
      .select(p.map(d => features(d).cast("double").as(s"x$d")) ++
        p.map(d => round(features(d).cast("double") * lit(1e6))
          .cast("long").as(s"m$d")): _*)
      .groupBy((p.map(d => col(s"x$d")) ++ p.map(d => col(s"m$d"))): _*)
      .agg(count(lit(1)).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // seed: k smallest distinct tuples (TakeOrdered — never a full sort)
    val seedW = org.apache.spark.sql.expressions.Window
      .orderBy(p.map(d => col(s"x$d")): _*)
    var centroids = pts.select(p.map(d => col(s"x$d")): _*).distinct()
      .orderBy(p.map(d => col(s"x$d")): _*).limit(k)
      .withColumn("cid", (row_number().over(seedW) - 1).cast("int"))
      .select(col("cid") +: p.map(d => col(s"x$d").as(s"c$d")): _*)

    def dist2: Column = p.map { d =>
      (col(s"x$d") - col(s"c$d")) * (col(s"x$d") - col(s"c$d"))
    }.reduce(_ + _)

    // one assignment pass: per distinct tuple, min over the k
    // (dist², cid) pairs — an order-free exact argmin (struct
    // comparison), map-side combined
    def assign(cents: DataFrame): DataFrame =
      pts.crossJoin(broadcast(cents))
        .withColumn("__d2", dist2)
        .groupBy((p.map(d => col(s"x$d")) ++ p.map(d => col(s"m$d")) :+
          col("w")): _*)
        .agg(min(struct(col("__d2").as("d2"), col("cid").as("cid")))
          .as("__best"))
        .select((p.map(d => col(s"x$d")) ++ p.map(d => col(s"m$d")) :+
          col("w") :+ col("__best.cid").as("cid") :+
          col("__best.d2").as("d2")): _*)

    for (_ <- 1 to iters) {
      val assigned = assign(centroids)
      val sums = assigned.groupBy(col("cid"))
        .agg(sum(col("w")).as("n"),
          p.map(d => sum(col(s"m$d") * col("w")).as(s"s$d")): _*)
      centroids = Checkpointing.cut(centroids
        .join(sums, Seq("cid"), "left")
        .select(col("cid") +: p.map(d =>
          coalesce(col(s"s$d").cast("double") / col("n").cast("double") /
            lit(1e6), col(s"c$d")).as(s"c$d")): _*), eager = false)
    }
    // final assignment against the final model; quantized exact inertia
    val fin = assign(centroids)
      .groupBy(col("cid").as("cluster"))
      .agg(sum(col("w")).as("n"),
        sum(round(col("d2") * lit(1e6)).cast("long") * col("w"))
          .as("__iq"))
    fin.join(centroids.withColumnRenamed("cid", "cluster"), Seq("cluster"))
      .select((col("cluster") +: col("n") +: p.map(d => col(s"c$d")) :+
        (col("__iq").cast("double") / lit(1e6)).as("inertia")): _*)
  }
}
