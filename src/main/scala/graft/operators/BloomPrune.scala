package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning: filter a large probe side MAP-SIDE with
  * a compact sketch of the build side's keys before the exact join runs.
  *
  * Why this exists at 100 TB: a semi-join `probe ⋉ build` with a selective
  * build side still shuffles the ENTIRE probe side on the join key before
  * any row is dropped. A bloom filter of the build keys (≈ 1.2 MB per
  * million keys at 1% fpp) broadcast to every task prunes non-matching
  * probe rows before the exchange, cutting shuffle volume to
  * |matches| + fpp·|probe|. The exact semi-join afterwards removes the
  * false positives, so the RESULT is identical to the plain semi-join —
  * only the plan is cheaper. This is Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` strategy made explicit and
  * composable (the optimizer only injects it under specific shuffle-join
  * shapes; this operator applies it wherever the caller knows better).
  *
  * Build is `DataFrameStatFunctions.bloomFilter` (public sketch API):
  * a distributed aggregation over the build side producing one driver-side
  * sketch that is then torrent-broadcast — the build side is never
  * collected row-by-row.
  */
object BloomPrune {

  /** `probe ⋉ build` on long keys, bloom-pruned map-side first.
    *
    * @param expectedItems sizing for the sketch (distinct build keys);
    *                      overestimates only cost memory, underestimates
    *                      only raise fpp — correctness is unaffected either
    *                      way because of the exact semi-join behind it.
    */
  def semiJoinLong(
      probe: DataFrame,
      probeKey: String,
      build: DataFrame,
      buildKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bf = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    probe
      .filter(mightContain(col(probeKey)))
      .join(build.select(col(buildKey)).distinct(),
        col(probeKey) === col(buildKey), "left_semi")
  }

  /** The pruning predicate alone (no exact join behind it) — for flows
    * that tolerate fpp false positives in exchange for a single pass,
    * e.g. pre-filtering a scan feeding a downstream exact aggregation. */
  def predicateLong(
      probe: DataFrame,
      probeKey: Column,
      build: DataFrame,
      buildKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): Column = {
    val bf = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    mightContain(probeKey)
  }
}
