package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution / record linkage): join two
  * frames on approximate string equality — the standard two-phase shape
  * every ER system uses (Fellegi-Sunter lineage: a cheap BLOCKING key
  * prunes the candidate space, an exact edit-distance VERIFY confirms).
  *
  * Scale design (100 TB): never all-pairs — candidates come from an
  * equi-join on the caller-chosen block key (shuffle on the key; a hot
  * block is a skewed join key AQE splits). Verification is Spark's
  * codegen'd `levenshtein` with the THRESHOLD form: the banded DP
  * short-circuits at maxDist+1, so cost per candidate is
  * O(maxDist · len), not O(len²) — and a length prefilter drops
  * candidates whose size difference alone exceeds maxDist before any DP
  * runs. Recall is governed by the block key exactly as in
  * [[Dedup.minhashLshPairs]]: a true match blocked apart is invisible, so
  * block on what the corruption model preserves (compose multiple keys by
  * unioning candidate sets before [[bestMatch]]).
  */
object FuzzyJoin {

  private val Working = Seq("__fz_block", "__fz_plen", "__fz_clen")

  /** Candidate matches: every (probe row, catalog row) pair sharing a
    * block key with `levenshtein(probeText, catalogText) <= maxDist`.
    * Output = all probe columns + all catalog columns + `dist`; the two
    * frames must have disjoint column sets (loud failure beats silent
    * post-join ambiguity). */
  def blockedLevenshtein(probes: DataFrame, catalog: DataFrame,
                         probeText: Column, catalogText: Column,
                         probeBlock: Column, catalogBlock: Column,
                         maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val shared = probes.columns.toSet.intersect(catalog.columns.toSet)
    require(shared.isEmpty,
      s"probe and catalog column names must be disjoint, both have $shared")
    val reserved =
      (Working :+ "dist").filter((probes.columns ++ catalog.columns).contains)
    require(reserved.isEmpty, s"reserved column names $reserved in inputs")
    val p = probes
      .withColumn("__fz_block", probeBlock)
      .withColumn("__fz_plen", length(probeText))
    val c = catalog
      .withColumn("__fz_block", catalogBlock)
      .withColumn("__fz_clen", length(catalogText))
    p.join(c, "__fz_block")
      // |len(a) − len(b)| is a levenshtein lower bound: prune on two
      // cached ints before any DP cell is touched
      .filter(abs(col("__fz_plen") - col("__fz_clen")) <= maxDist)
      .withColumn("dist", levenshtein(probeText, catalogText, maxDist))
      .filter(col("dist") >= 0) // threshold form returns -1 past maxDist
      .drop(Working: _*)
  }

  /** Resolution: keep each probe's single best candidate — minimum
    * `dist`, ties broken by the ascending `tieBreak` columns (pass the
    * catalog's key for a total, deterministic order). Declarative
    * `min_by` over a struct: map-side partial combine, no per-probe row
    * explosion, a million-candidate hot probe never sits in one task. */
  def bestMatch(candidates: DataFrame, probeKey: Seq[String],
                tieBreak: Seq[Column]): DataFrame = {
    val payload = candidates.columns.filterNot(probeKey.contains)
    candidates
      .groupBy(probeKey.map(col): _*)
      .agg(min_by(struct(payload.map(col): _*),
        struct(col("dist") +: tieBreak: _*)).as("__fz_best"))
      .select(probeKey.map(col) ++
        payload.map(f => col(s"__fz_best.$f").as(f)): _*)
  }
}
