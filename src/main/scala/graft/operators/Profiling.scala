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
    val aggs = pairs.zipWithIndex.flatMap { case ((x, y), i) =>
      val both = ok(x) && ok(y)
      def s(e: org.apache.spark.sql.Column, name: String) =
        sum(when(both, e)).as(s"${name}_$i")
      Seq(
        count(when(both, lit(1))).as(s"n_$i"),
        s(d17(x), "sx"), s(d17(y), "sy"),
        s((d19(x) * d19(y)).cast("decimal(38,6)"), "sxy"),
        s((d19(x) * d19(x)).cast("decimal(38,6)"), "sxx"),
        s((d19(y) * d19(y)).cast("decimal(38,6)"), "syy"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
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
      .withColumn("t",
        round(((col("o").cast("double") - col("e")) *
          (col("o").cast("double") - col("e")) / col("e")) * lit(1e12))
          .cast("long"))
    terms.agg(
      (sum(col("t")).cast("double") / lit(1e12)).as("chi2"),
      ((count_distinct(col("r")) - 1) * (count_distinct(col("c")) - 1))
        .as("dof"),
      max(col("n")).as("n"))
      .withColumn("significant", col("chi2") > lit(critical))
  }
}
