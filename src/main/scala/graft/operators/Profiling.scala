package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Catalog statistics (the ANALYZE TABLE shape): per-column row count,
  * null count, exact distinct count, and min/max — the numbers a
  * cost-based planner, a data-quality monitor, or a migration diff reads
  * first.
  *
  * Scale design (100 TB): one aggregate PER COLUMN, unioned —
  * deliberately N single-column passes rather than one pass with N exact
  * `count_distinct`s, because multiple exact distinct aggregates in one
  * plan make Catalyst Expand every input row N× (the a13/a11 lesson:
  * that blow-up dominated the a11 row until the Expand was removed),
  * while N parquet scans each prune to ONE column and run as independent
  * stages. Exactness is the point of this surface; the one-pass
  * approximate profile is `approx_count_distinct` (the a11 row's HLL
  * path). min/max arrive as strings so heterogeneous columns stack into
  * one frame — cast inputs to a stable-formatting type first (integers,
  * strings; NOT raw doubles, whose string forms are engine-specific).
  */
object Profiling {

  def columnProfile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "at least one column required")
    val missing = columns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns $missing not in frame")
    columns.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_nulls"),
        count_distinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_str"),
        max(col(c)).cast("string").as("max_str"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }.reduce(_ unionAll _)
  }

  /** Pairwise Pearson correlation matrix (round 9) — the first screen
    * of any feature audit. ONE aggregate pass computes every pair's
    * sufficient statistics (n, Σx, Σy, Σxy, Σxx, Σyy) — unlike
    * [[columnProfile]] there is no exact-distinct Expand trap here, so
    * a single map-side-combined pass is strictly better than p(p−1)/2
    * scans. Rows where EITHER side of a pair is null/over-domain drop
    * from that pair only (pairwise deletion, the pandas `.corr()`
    * default).
    *
    * Determinism: sums follow the ar1ParamCtes DECIMAL ladder
    * (17,6 → 19,6 factors, 38,6 products) so both engines reduce in
    * exact arithmetic regardless of partition order; the final
    * (n·Σxy − ΣxΣy)/√(…·…) is a fixed IEEE expression on
    * identically-derived doubles. Zero-variance columns yield NULL
    * corr (0/0 guard), the SQL convention. */
  def corrMatrix(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.size >= 2, s"need at least two columns: $columns")
    val missing = columns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns $missing not in frame")
    val pairs = for {
      i <- columns.indices; j <- columns.indices if i < j
    } yield (columns(i), columns(j))
    def d17(c: String) = col(c).cast("decimal(17,6)")
    def d19(c: String) = d17(c).cast("decimal(19,6)")
    def ok(c: String) = col(c).isNotNull && abs(col(c)) < 1e11
    // project each cast/guard/product ONCE, then aggregate the
    // precomputed columns — repeating the decimal ladder inside every
    // conditional aggregate re-evaluated it 18 times per row (measured
    // 5x the steady-state cost at sf0.1); the aggregated VALUES are
    // identical, so the cross-engine contract is unchanged.
    // Dedup.spread first (round 16, guide §2.5): the 18 decimal-ladder
    // partial aggregates are CPU-dense per row, and a small input scans
    // as one split — the exact sums are partition-order-independent, so
    // the spread only parallelizes, never changes a value.
    val proj = Dedup.spread(df.select(columns.map(col): _*)).select(
      columns.flatMap { c => Seq(
        d17(c).as(s"__d_$c"), ok(c).as(s"__ok_$c"),
        (d19(c) * d19(c)).cast("decimal(38,6)").as(s"__q_$c")) } ++
        pairs.zipWithIndex.map { case ((x, y), i) =>
          (d19(x) * d19(y)).cast("decimal(38,6)").as(s"__p_$i") }: _*)
    val aggs = pairs.zipWithIndex.flatMap { case ((x, y), i) =>
      val both = col(s"__ok_$x") && col(s"__ok_$y")
      def s(c: org.apache.spark.sql.Column, name: String) =
        sum(when(both, c)).as(s"${name}_$i")
      Seq(
        count(when(both, lit(1))).as(s"n_$i"),
        s(col(s"__d_$x"), "sx"), s(col(s"__d_$y"), "sy"),
        s(col(s"__p_$i"), "sxy"),
        s(col(s"__q_$x"), "sxx"), s(col(s"__q_$y"), "syy"))
    }
    val stats = proj.agg(aggs.head, aggs.tail: _*)
    // ONE row of sufficient statistics exploded into |pairs| result rows
    // — a unionAll of per-pair selects would re-run the whole aggregate
    // once per pair (measured 3x the scan cost at sf0.1)
    val pairStructs = pairs.zipWithIndex.map { case ((x, y), i) =>
      val n = col(s"n_$i").cast("double")
      def dbl(p: String) = col(s"${p}_$i").cast("double")
      val cov = n * dbl("sxy") - dbl("sx") * dbl("sy")
      val vx = n * dbl("sxx") - dbl("sx") * dbl("sx")
      val vy = n * dbl("syy") - dbl("sy") * dbl("sy")
      struct(
        lit(x).as("col_x"), lit(y).as("col_y"), col(s"n_$i").as("n"),
        when(vx > 0 && vy > 0, cov / sqrt(vx * vy)).as("corr"))
    }
    stats.select(explode(array(pairStructs: _*)).as("p"))
      .select(col("p.col_x").as("col_x"), col("p.col_y").as("col_y"),
        col("p.n").as("n"), col("p.corr").as("corr"))
  }

  /** Chi-square test of independence between two categorical columns
    * (round 9) — "does segment membership depend on the category?", the
    * categorical counterpart of [[corrMatrix]]. One count aggregate
    * builds the contingency table; expected counts e = rowTot·colTot/N
    * and the per-cell terms (o−e)²/e ride window totals over the
    * |rows|·|cols| cell frame (never a second data pass). The cell-term
    * reduction is quantized to BIGINT 1e-12 units (the Graph.pageRank
    * portability recipe — a double→DECIMAL cast is not bitwise-stable
    * across engines, round-to-integer of the same double is). Output:
    * one row with chi2, the degrees of freedom, and the α=0.05 verdict
    * against the caller-supplied critical value (kept a parameter —
    * no chi-square CDF in either engine's portable surface). */
  /** One-way ANOVA F-test (round 9) — "does the metric's MEAN differ
    * across groups?", completing the stats triad ([[corrMatrix]] =
    * numeric×numeric, [[chiSquareIndependence]] = cat×cat, this =
    * cat×numeric). One decimal-exact aggregate per group, then the
    * between/within sum-of-squares terms quantize to BIGINT 1e-6 units
    * (magnitudes here are n·mean² ≈ 1e8, so 1e-6 grain keeps the sums
    * far inside int64 — same recipe, coarser grain than pageRank's
    * rank-scale 1e-12). Zero within-variance (all groups constant)
    * yields NULL F. `critical` is the caller's F(df1, df2, α) quantile
    * — no F CDF in either engine's portable surface. */
  def anovaF(df: DataFrame, group: Column, value: Column,
             critical: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def d17(c: Column) = c.cast("decimal(17,6)")
    def d19(c: Column) = d17(c).cast("decimal(19,6)")
    val g = df
      .filter(group.isNotNull && value.isNotNull && abs(value) < 1e11)
      .groupBy(group.as("g"))
      .agg(count(lit(1)).as("n_g"),
        sum(d17(value)).as("s_g"),
        sum((d19(value) * d19(value)).cast("decimal(38,6)")).as("ss_g"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val terms = g
      .withColumn("n", sum(col("n_g")).over(all))
      .withColumn("s", sum(col("s_g")).over(all))
      .withColumn("k", count(lit(1)).over(all))
      .withColumn("m_g", col("s_g").cast("double") / col("n_g").cast("double"))
      .withColumn("m", col("s").cast("double") / col("n").cast("double"))
      .withColumn("bq",
        round(col("n_g").cast("double") * (col("m_g") - col("m")) *
          (col("m_g") - col("m")) * lit(1e6)).cast("long"))
      .withColumn("wq",
        round((col("ss_g").cast("double") -
          col("n_g").cast("double") * col("m_g") * col("m_g")) * lit(1e6))
          .cast("long"))
    terms.agg(
      max(col("n")).as("n"), max(col("k")).as("k"),
      sum(col("bq")).as("sb"), sum(col("wq")).as("sw"))
      .select(
        col("n"), (col("k") - 1).as("df1"), (col("n") - col("k")).as("df2"),
        when(col("sw") > 0 && col("k") > 1 && col("n") > col("k"),
          (col("sb").cast("double") / lit(1e6) /
            (col("k") - 1).cast("double")) /
            (col("sw").cast("double") / lit(1e6) /
              (col("n") - col("k")).cast("double"))).as("f"))
      .withColumn("significant", col("f") > lit(critical))
  }

  def chiSquareIndependence(df: DataFrame, rowCat: Column, colCat: Column,
                            critical: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val observed = df
      .filter(rowCat.isNotNull && colCat.isNotNull)
      .groupBy(rowCat.as("r"), colCat.as("c"))
      .agg(count(lit(1)).as("o"))
    // the FULL grid, zeros included: an absent (r,c) combination still
    // contributes (0−e)²/e = e — dropping empty cells understates chi2
    val cells = observed.select(col("r")).distinct()
      .crossJoin(observed.select(col("c")).distinct())
      .join(observed, Seq("r", "c"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val wr = Window.partitionBy(col("r")).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wc = Window.partitionBy(col("c")).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val terms = cells
      .withColumn("n", sum(col("o")).over(all))
      .withColumn("rt", sum(col("o")).over(wr))
      .withColumn("ct", sum(col("o")).over(wc))
      .withColumn("e",
        col("rt").cast("double") * col("ct").cast("double") /
          col("n").cast("double"))
      // 1e-9 grain (the benfordTest choice, NOT 1e-12): a per-cell term
      // quantizes to BIGINT only while term·grain < 2⁶³, and large-n
      // strongly-dependent tables push single-cell terms past the ~9.2e6
      // ceiling a 1e12 multiplier leaves — 1e9 raises that ceiling to
      // ~9.2e9 while chi2 still carries 9 exact decimals
      .withColumn("t",
        round(((col("o").cast("double") - col("e")) *
          (col("o").cast("double") - col("e")) / col("e")) * lit(1e9))
          .cast("long"))
    terms.agg(
      (sum(col("t")).cast("double") / lit(1e9)).as("chi2"),
      ((count_distinct(col("r")) - 1) * (count_distinct(col("c")) - 1))
        .as("dof"),
      max(col("n")).as("n"))
      .withColumn("significant", col("chi2") > lit(critical))
  }

  /** Distribution-drift detection by total variation distance (round 9)
    * — the monitoring primitive behind "has this feature's distribution
    * moved?": each group's series splits positionally into an early and
    * a late half (row_number under the caller's total order — the W5
    * chronological-split shape), both halves histogram onto ONE shared
    * equi-width grid (per-group min/max over the WHOLE series — the
    * Sketches.histBounds shared-grid contract, inlined), and
    *   TVD = ½ Σ_bins |p_early(bin) − p_late(bin)|
    * is computed in the exact integer cross-multiplied form
    * Σ|n₁ᵢ·N₂ − n₂ᵢ·N₁| / (2·N₁·N₂). TVD ∈ [0,1] is the maximum
    * probability mass any event can disagree by — the standard
    * PSI-alternative with no logarithm, so the whole statistic is exact
    * integers plus ONE hash-stable division; the `drifted` verdict
    * (TVD ≥ thresholdMilli/1000) never touches a double.
    *
    * Output: `(group…, n_early, n_late, tvd, drifted)`; singleton groups
    * (no interior split) are dropped. Scale: one group-keyed window pass
    * + one (group, bin, half) aggregate; int64 headroom needs
    * n₁ᵢ·N₂ < 2⁶³ — fine to ~3·10⁹ rows per group, recast the products
    * to DECIMAL(38) beyond. */
  def driftTvd(df: DataFrame, group: Seq[String], value: Column,
               orderCols: Seq[Column], nBins: Int,
               thresholdMilli: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBins >= 2 && nBins <= 100000, s"nBins must be in [2,1e5]: $nBins")
    require(thresholdMilli >= 0 && thresholdMilli <= 1000,
      s"thresholdMilli must be in [0,1000]: $thresholdMilli")
    val gc = group.map(col)
    val w = Window.partitionBy(gc: _*).orderBy(orderCols: _*)
    val frame = Window.partitionBy(gc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val base = df.filter(value.isNotNull)
      .withColumn("__v", value)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(frame))
      .withColumn("__lo", min(value).over(frame))
      .withColumn("__hi", max(value).over(frame))
      .filter(col("__n") >= 2)
      .withColumn("__width",
        when(col("__hi") === col("__lo"), lit(1.0))
          .otherwise((col("__hi") - col("__lo")) / lit(nBins.toDouble)))
      .withColumn("__bin",
        least(greatest(floor((col("__v") - col("__lo")) / col("__width"))
          .cast("long"), lit(0L)), lit(nBins.toLong - 1)))
      .withColumn("__early", col("__rn") * 2 <= col("__n"))
    val cells = base.groupBy(gc :+ col("__bin"): _*)
      .agg(sum(when(col("__early"), lit(1L)).otherwise(lit(0L))).as("n1"),
        sum(when(!col("__early"), lit(1L)).otherwise(lit(0L))).as("n2"))
    val totals = Window.partitionBy(gc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("t1", sum(col("n1")).over(totals))
      .withColumn("t2", sum(col("n2")).over(totals))
      .withColumn("__d", abs(col("n1") * col("t2") - col("n2") * col("t1")))
      .groupBy(gc: _*)
      .agg(max(col("t1")).as("n_early"), max(col("t2")).as("n_late"),
        sum(col("__d")).as("__s"))
      .select((gc :+ col("n_early") :+ col("n_late") :+
        (col("__s").cast("double") /
          (lit(2.0) * col("n_early").cast("double") *
            col("n_late").cast("double"))).as("tvd") :+
        (col("__s") * lit(1000L) >=
          lit(2L * thresholdMilli) * col("n_early") * col("n_late"))
          .as("drifted")): _*)
  }

  /** Gini impurity of a categorical distribution per group (round 9) —
    * the no-logarithm diversity index (CART's split criterion; entropy's
    * exact-arithmetic sibling): G = 1 − Σ (nᵢ/N)² = (N² − Σ nᵢ²)/N²,
    * computed entirely in exact integers with ONE final division.
    * 0 = all mass on one category; (k−1)/k = uniform over k. Output:
    * `(group…, n, n_cats, gini)`. Two map-side-combined aggregates
    * (category cells, then groups) — one shuffle chain on the group key. */
  def giniImpurity(df: DataFrame, group: Seq[String],
                   cat: Column): DataFrame = {
    val gc = group.map(col)
    df.filter(cat.isNotNull)
      .groupBy(gc :+ cat.as("__c"): _*)
      .agg(count(lit(1)).as("__nc"))
      .groupBy(gc: _*)
      .agg(sum(col("__nc")).as("n"),
        count(lit(1)).as("n_cats"),
        sum(col("__nc") * col("__nc")).as("__ss"))
      .select((gc :+ col("n") :+ col("n_cats") :+
        ((col("n") * col("n") - col("__ss")).cast("double") /
          (col("n") * col("n")).cast("double")).as("gini")): _*)
  }

  /** First-significant-digit distribution of `value` expressed in exact
    * cents, for Benford's-law forensics. */
  private[graft] def benfordProbs: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))

  /** Benford's-law goodness-of-fit (round 9) — the fraud/synthetic-data
    * forensic: naturally-occurring multi-magnitude amounts lead with
    * digit d at rate log₁₀(1 + 1/d) (Benford 1938; Newcomb 1881), and a
    * χ² goodness-of-fit against that expectation flags fabricated or
    * truncated figures. Completes the test quartet (corr = num×num,
    * chi2 = cat×cat, F = cat×num, this = one observed distribution vs a
    * CLOSED-FORM expectation).
    *
    * Determinism: amounts quantize to exact BIGINT cents and the leading
    * digit is the first character of the INTEGER's decimal rendering
    * (integer→string is engine-stable; a double's rendering is not —
    * the fingerprints lesson). The expected probabilities are literal
    * constants generated from ONE Scala table and embedded verbatim in
    * both engines; each digit's χ² term is a fixed IEEE chain quantized
    * to BIGINT 1e-9 units for the exact order-free reduction (1e-9, not
    * the pageRank 1e-12: terms reach ~1e7 at large n, and the coarser
    * grain keeps 100× headroom inside int64). The 9-cell grid always
    * materializes — an absent digit still contributes its full expected
    * mass, the chiSquareIndependence zero-cell lesson.
    *
    * Output: 9 rows `(digit, observed, expected_p, chi2, significant)` —
    * the reconciliation table with the verdict on every row (dof is
    * always 8). `critical` is χ²(8, α) from the caller. Scale: one
    * map-side-combined 9-cell aggregate; the window runs on 9 rows. */
  def benfordTest(df: DataFrame, value: Column, critical: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(value.isNotNull && value > 0)
      .withColumn("__cents", round(value * lit(100)).cast("long"))
      .filter(col("__cents") > 0)
      .withColumn("digit",
        substring(col("__cents").cast("string"), 1, 1).cast("long"))
    val obs = base.groupBy(col("digit")).agg(count(lit(1)).as("observed"))
    import df.sparkSession.implicits._
    val expected = benfordProbs.map { case (d, p) => (d.toLong, p) }
      .toDF("digit", "expected_p")
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    expected.join(obs, Seq("digit"), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
      .withColumn("n", sum(col("observed")).over(all))
      .withColumn("e", col("n").cast("double") * col("expected_p"))
      .withColumn("t",
        round(((col("observed").cast("double") - col("e")) *
          (col("observed").cast("double") - col("e")) / col("e")) * lit(1e9))
          .cast("long"))
      .withColumn("chi2", sum(col("t")).over(all).cast("double") / lit(1e9))
      .withColumn("significant", col("chi2") > lit(critical))
      .select(col("digit"), col("observed"), col("expected_p"),
        col("chi2"), col("significant"))
  }
}
