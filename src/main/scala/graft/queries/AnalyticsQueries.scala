package graft.queries

import graft.Tables
import graft.operators.EventAnalytics

/** Event-sequence analytics rows (engine extension): ordered funnel,
  * weekly cohort retention, and journey-path counting over the `events`
  * table — the downstream-BI workloads of the reference's event pipeline,
  * re-expressed as distributed operators ([[graft.operators.EventAnalytics]]).
  *
  * Determinism: all outputs are integer counts, DATEs, or strings built
  * from explicitly (ts, event_id)-ordered sequences — no doubles anywhere,
  * so the DuckDB differential is exact by construction.
  */
object AnalyticsQueries {

  private val funnelStages = Seq("signup", "view", "click", "purchase")

  /** Generated DuckDB oracle for a27_corr_matrix — one statistics CTE
    * mirroring Profiling.corrMatrix's DECIMAL ladder (the ar1ParamCtes
    * 17,6 → 19,6 → 38,6 shape) per pair, then one SELECT per pair
    * unioned. Generated from the same pair list as the Spark side so
    * the two can never drift. */
  private def corrOracle(cols: Seq[String]): String = {
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    def d19(c: String) = s"CAST(CAST($c AS DECIMAL(17,6)) AS DECIMAL(19,6))"
    val aggs = pairs.zipWithIndex.flatMap { case ((x, y), i) =>
      val both = s"$x IS NOT NULL AND abs($x) < 1e11 AND " +
        s"$y IS NOT NULL AND abs($y) < 1e11"
      Seq(
        s"count(CASE WHEN $both THEN 1 END) AS n_$i",
        s"sum(CASE WHEN $both THEN CAST($x AS DECIMAL(17,6)) END) AS sx_$i",
        s"sum(CASE WHEN $both THEN CAST($y AS DECIMAL(17,6)) END) AS sy_$i",
        s"sum(CASE WHEN $both THEN CAST(${d19(x)} * ${d19(y)} AS DECIMAL(38,6)) END) AS sxy_$i",
        s"sum(CASE WHEN $both THEN CAST(${d19(x)} * ${d19(x)} AS DECIMAL(38,6)) END) AS sxx_$i",
        s"sum(CASE WHEN $both THEN CAST(${d19(y)} * ${d19(y)} AS DECIMAL(38,6)) END) AS syy_$i")
    }
    val rows = pairs.zipWithIndex.map { case ((x, y), i) =>
      val n = s"CAST(n_$i AS DOUBLE)"
      def dbl(p: String) = s"CAST(${p}_$i AS DOUBLE)"
      val cov = s"($n * ${dbl("sxy")} - ${dbl("sx")} * ${dbl("sy")})"
      val vx = s"($n * ${dbl("sxx")} - ${dbl("sx")} * ${dbl("sx")})"
      val vy = s"($n * ${dbl("syy")} - ${dbl("sy")} * ${dbl("sy")})"
      s"SELECT '$x' AS col_x, '$y' AS col_y, n_$i AS n, " +
        s"CASE WHEN $vx > 0 AND $vy > 0 THEN $cov / sqrt($vx * $vy) END AS corr FROM s"
    }
    s"WITH s AS (SELECT ${aggs.mkString(", ")} FROM lineitem)\n" +
      rows.mkString("\nUNION ALL\n")
  }

  /** Generated DuckDB oracle for graph_pagerank: the same edge
    * derivation, then `iters` unrolled rank CTEs, each mirroring
    * Graph.pageRank's arithmetic exactly — per-edge contribution
    * `rank * (w/ow)` in doubles, quantized to BIGINT 1e-15 units for
    * an exact integer reduction (a double-to-DECIMAL cast is NOT
    * bitwise-portable — see Graph.pageRank scaladoc; measured, not
    * theorized), damping update `d*(Σ/1e15) + (1.0-d)*r0` (both
    * engines compute `1.0-d` in IEEE rather than hard-coding 0.15,
    * which is NOT the same double). Generated from the same
    * (damping, iters) as the Spark side so the formulas cannot
    * drift. */
  private def pageRankOracle(damping: Double, iters: Int): String = {
    val rounds = (1 to iters).map { t =>
      s"""r$t AS (
         |  SELECT n.id,
         |    $damping * (CAST(coalesce(s.cs, 0) AS DOUBLE) / 1e15)
         |      + (1.0 - $damping) * (SELECT r0 FROM nn) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS id,
         |      sum(CAST(round((r.rank
         |        * (CAST(e.w AS DOUBLE) / CAST(o.ow AS DOUBLE))) * 1e15)
         |        AS BIGINT)) AS cs
         |    FROM edges e
         |    JOIN outw o ON e.src = o.src
         |    JOIN r${t - 1} r ON r.id = e.src
         |    GROUP BY 1) s ON s.id = n.id)""".stripMargin
    }
    s"""WITH lagged AS (
       |  SELECT event_type,
       |    lag(event_type) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS prev
       |  FROM events),
       |edges AS (
       |  SELECT prev AS src, event_type AS dst, count(*) AS w
       |  FROM lagged WHERE prev IS NOT NULL GROUP BY 1, 2),
       |nodes AS (
       |  SELECT src AS id FROM edges UNION SELECT dst FROM edges),
       |nn AS (SELECT CAST(1.0 AS DOUBLE) / count(*) AS r0 FROM nodes),
       |outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
       |r0 AS (SELECT id, (SELECT r0 FROM nn) AS rank FROM nodes),
       |${rounds.mkString(",\n")}
       |SELECT id, rank FROM r$iters""".stripMargin
  }

  /** Generated DuckDB oracle for a34_bootstrap_ci — the weight CASE
    * chain comes from the SAME inverse-CDF table
    * (Sampling.PoissonCdfMicro) and the CI ranks from the same
    * Sampling.bootstrapRanks as the Spark side, so the two engines
    * cannot drift (the corrOracle/pageRankOracle pattern). */
  private def bootstrapOracle(replicates: Int, seed: String): String = {
    val (loRank, hiRank) = graft.operators.Sampling.bootstrapRanks(replicates)
    val wCase = graft.operators.Sampling.PoissonCdfMicro
      .map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH base AS (
       |  SELECT event_type, event_id,
       |    CAST(round(value * 1e6) AS BIGINT) AS v
       |  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL),
       |f AS (
       |  SELECT event_type, count(*) AS n,
       |    CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6 AS mean
       |  FROM base GROUP BY 1),
       |r AS (
       |  SELECT event_type, v, b.b AS b,
       |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':'
       |      || CAST(b.b // 3 AS VARCHAR) || ':$seed'),
       |      1 + (b.b % 3) * 10, 10)) AS BIGINT) % 1000000 AS u
       |  FROM base,
       |    LATERAL unnest(generate_series(0, ${replicates - 1})) AS b(b)),
       |wt AS (SELECT event_type, b, v, $wCase AS w FROM r),
       |rep AS (
       |  SELECT event_type, b, sum(w * v) AS swv, sum(w) AS sw
       |  FROM wt GROUP BY 1, 2 HAVING sum(w) > 0),
       |m0 AS (
       |  SELECT event_type, b,
       |    CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE) / 1e6 AS mean_b
       |  FROM rep),
       |m AS (
       |  SELECT event_type, mean_b, row_number() OVER (
       |    PARTITION BY event_type ORDER BY mean_b, b) AS rn
       |  FROM m0),
       |ci AS (
       |  SELECT event_type,
       |    min(CASE WHEN rn = $loRank THEN mean_b END) AS ci_lo,
       |    min(CASE WHEN rn = $hiRank THEN mean_b END) AS ci_hi
       |  FROM m GROUP BY 1)
       |SELECT f.event_type, f.n, f.mean, ci.ci_lo, ci.ci_hi
       |FROM f JOIN ci USING (event_type)""".stripMargin
  }

  /** Generated DuckDB oracle for graph_ppr — pageRankOracle's unrolled
    * rounds with the uniform teleport replaced by the source-set
    * e-vector (e(v) = 1/|S∩nodes| on sources, else 0); generated from
    * the same (damping, iters, sources) as the Spark side. */
  private def pprOracle(damping: Double, iters: Int,
                        sources: Seq[String]): String = {
    val srcList = sources.map(s => s"'$s'").mkString(", ")
    // CAST('…' AS DOUBLE): embed Spark's EXACT teleport factor — DuckDB
    // evaluates a bare (1.0 - 0.85) in DECIMAL (= exact 0.15, one ulp
    // BELOW Scala's IEEE 1.0-0.85), measured as a rank mismatch
    val tele = s"CAST('${1.0 - damping}' AS DOUBLE)"
    val damp = s"CAST('$damping' AS DOUBLE)"
    val rounds = (1 to iters).map { t =>
      s"""r$t AS (
         |  SELECT n.id,
         |    $damp * (CAST(coalesce(s.cs, 0) AS DOUBLE) / 1e15)
         |      + $tele * n.e AS rank
         |  FROM ne n LEFT JOIN (
         |    SELECT e.dst AS id,
         |      sum(CAST(round((r.rank
         |        * (CAST(e.w AS DOUBLE) / CAST(o.ow AS DOUBLE))) * 1e15)
         |        AS BIGINT)) AS cs
         |    FROM edges e
         |    JOIN outw o ON e.src = o.src
         |    JOIN r${t - 1} r ON r.id = e.src
         |    GROUP BY 1) s ON s.id = n.id)""".stripMargin
    }
    s"""WITH lagged AS (
       |  SELECT event_type,
       |    lag(event_type) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS prev
       |  FROM events),
       |edges AS (
       |  SELECT prev AS src, event_type AS dst, count(*) AS w
       |  FROM lagged WHERE prev IS NOT NULL GROUP BY 1, 2),
       |nodes AS (
       |  SELECT src AS id FROM edges UNION SELECT dst FROM edges),
       |ns AS (
       |  SELECT CAST(1.0 AS DOUBLE) / count(*) AS e0 FROM nodes
       |  WHERE id IN ($srcList)),
       |ne AS (
       |  SELECT id, CASE WHEN id IN ($srcList)
       |    THEN (SELECT e0 FROM ns) ELSE 0.0 END AS e
       |  FROM nodes),
       |outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
       |r0 AS (SELECT id, e AS rank FROM ne),
       |${rounds.mkString(",\n")}
       |SELECT id, rank FROM r$iters""".stripMargin
  }

  /** Generated DuckDB oracle for cluster_kmeans — the same weighted
    * distinct tuples, lexicographic seeding, per-round assignment
    * (argmin of the identical fixed IEEE distance chain, ties to the
    * smaller cid) and exact micro-unit centroid updates as
    * Clustering.kmeansLloyd, unrolled one CTE pair per Lloyd round
    * (the pageRankOracle pattern). `featSql` are the p feature
    * expressions over `srcSql`. */
  private def kmeansOracle(srcSql: String, featSql: Seq[String], k: Int,
                           iters: Int): String = {
    val p = featSql.indices
    val xs = p.map(d => s"x$d").mkString(", ")
    val notNull = featSql.map(f => s"$f IS NOT NULL").mkString(" AND ")
    val ptsSel = (p.map(d => s"${featSql(d)} AS x$d") ++
      p.map(d => s"CAST(round(${featSql(d)} * 1e6) AS BIGINT) AS m$d"))
      .mkString(", ")
    val d2 = p.map(d => s"(p.x$d - c.c$d) * (p.x$d - c.c$d)")
      .mkString(" + ")
    def assignCte(name: String, cents: String) =
      s"""$name AS (
         |  SELECT * EXCLUDE (rn) FROM (
         |    SELECT *, row_number() OVER (PARTITION BY $xs
         |      ORDER BY d2, cid) AS rn
         |    FROM (
         |      SELECT p.*, c.cid, $d2 AS d2
         |      FROM pts p CROSS JOIN $cents c))
         |  WHERE rn = 1)""".stripMargin
    val rounds = (1 to iters).map { t =>
      val upd = p.map(d =>
        s"coalesce(CAST(s.s$d AS DOUBLE) / CAST(s.n AS DOUBLE) / 1e6, " +
          s"c.c$d) AS c$d").mkString(", ")
      val sums = p.map(d => s"CAST(sum(m$d * w) AS BIGINT) AS s$d")
        .mkString(", ")
      s"""${assignCte(s"a$t", s"c${t - 1}")},
         |c$t AS (
         |  SELECT c.cid, $upd
         |  FROM c${t - 1} c LEFT JOIN (
         |    SELECT cid, CAST(sum(w) AS BIGINT) AS n, $sums
         |    FROM a$t GROUP BY 1) s ON s.cid = c.cid)""".stripMargin
    }
    s"""WITH pts AS (
       |  SELECT $xs, ${p.map(d => s"m$d").mkString(", ")},
       |    count(*) AS w
       |  FROM (SELECT $ptsSel FROM $srcSql WHERE $notNull)
       |  GROUP BY ALL),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY $xs) - 1 AS INTEGER)
       |    AS cid, ${p.map(d => s"x$d AS c$d").mkString(", ")}
       |  FROM (SELECT DISTINCT $xs FROM pts)
       |  QUALIFY cid < $k),
       |${rounds.mkString(",\n")},
       |${assignCte("afin", s"c$iters")}
       |SELECT a.cid AS cluster, CAST(sum(a.w) AS BIGINT) AS n,
       |  ${p.map(d => s"any_value(c.c$d) AS c$d").mkString(", ")},
       |  CAST(CAST(sum(CAST(round(a.d2 * 1e6) AS BIGINT) * a.w)
       |    AS BIGINT) AS DOUBLE) / 1e6 AS inertia
       |FROM afin a JOIN c$iters c ON c.cid = a.cid
       |GROUP BY 1""".stripMargin
  }

  /** Generated DuckDB oracle for a33_benford — the expected-probability
    * literals come from the SAME Scala table (Profiling.benfordProbs) as
    * the Spark side; each is CAST to DOUBLE explicitly (a bare decimal
    * literal parses as DECIMAL in DuckDB and would change the
    * arithmetic). */
  private def benfordOracle(critical: Double): String = {
    // CAST('…' AS DOUBLE): the string→double parse is correctly rounded;
    // a bare numeric literal parses as DECIMAL first and CASTs a
    // one-ulp-off double (measured on digit 2's probability)
    val expVals = graft.operators.Profiling.benfordProbs
      .map { case (d, p) => s"($d, CAST('$p' AS DOUBLE))" }.mkString(", ")
    s"""WITH base AS (
       |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
       |  FROM lineitem
       |  WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0),
       |obs AS (
       |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
       |    AS digit, count(*) AS observed
       |  FROM base WHERE cents > 0 GROUP BY 1),
       |ex AS (SELECT * FROM (VALUES $expVals) AS e(digit, expected_p)),
       |cells AS (
       |  SELECT CAST(ex.digit AS BIGINT) AS digit,
       |    coalesce(o.observed, CAST(0 AS BIGINT)) AS observed,
       |    ex.expected_p
       |  FROM ex LEFT JOIN obs o ON o.digit = ex.digit),
       |terms AS (
       |  SELECT digit, observed, expected_p,
       |    CAST(sum(observed) OVER () AS BIGINT) AS n
       |  FROM cells),
       |t2 AS (
       |  SELECT digit, observed, expected_p,
       |    CAST(round(((CAST(observed AS DOUBLE)
       |        - CAST(n AS DOUBLE) * expected_p)
       |      * (CAST(observed AS DOUBLE) - CAST(n AS DOUBLE) * expected_p)
       |      / (CAST(n AS DOUBLE) * expected_p)) * 1e9) AS BIGINT) AS t
       |  FROM terms)
       |SELECT digit, observed, expected_p,
       |  CAST(sum(t) OVER () AS DOUBLE) / 1e9 AS chi2,
       |  CAST(sum(t) OVER () AS DOUBLE) / 1e9 > $critical AS significant
       |FROM t2""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(

    // Oracle-exact k-means (round 9) — 3 Lloyd rounds, k=4, over the
    // first two embedding dimensions: deterministic lexicographic
    // seeding, argmin assignment on a fixed IEEE distance chain (ties
    // to the smaller cluster), centroid updates from exact BIGINT
    // micro-unit sums, quantized inertia. The oracle unrolls the SAME
    // arithmetic per round — bitwise agreement, the pageRank recipe
    // applied to clustering (the high-dim production k-means lives in
    // the IVF/PQ builders; this is its reproducible relational face).
    "cluster_kmeans" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, element_at}
        graft.operators.Clustering.kmeansLloyd(Tables.embeddings(s, dir),
          Seq(element_at(col("embedding"), 1).cast("double"),
            element_at(col("embedding"), 2).cast("double")),
          k = 4, iters = 3)
      },
      kmeansOracle("embeddings",
        Seq("CAST(embedding[1] AS DOUBLE)", "CAST(embedding[2] AS DOUBLE)"),
        k = 4, iters = 3)),

    // A33 (ext, round 9) — Benford first-digit goodness-of-fit over
    // l_extendedprice in exact cents: leading digit from the integer's
    // decimal rendering, closed-form expected shares embedded verbatim
    // in both engines, χ² terms quantized to BIGINT 1e-9 for an exact
    // order-free sum. The synthetic TPC-H price distribution is NOT
    // Benford — the verdict row legitimately reads significant=true;
    // what the oracle pins is the exact statistic.
    "a33_benford" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        graft.operators.Profiling.benfordTest(Tables.lineitem(s, dir),
          col("l_extendedprice"), critical = 15.507313055865453)
      },
      benfordOracle(critical = 15.507313055865453)),

    // A36 (ext, round 9) — drift detection: total variation distance
    // between each event_type's early and late half-distributions of
    // `value` on a shared 10-bin grid. Exact integer cross-multiplied
    // TVD with one division; the drifted verdict (θ=0.1) never touches
    // a double.
    "a36_drift_tvd" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        graft.operators.Profiling.driftTvd(Tables.events(s, dir),
          Seq("event_type"), col("value"), Seq(col("ts"), col("event_id")),
          nBins = 10, thresholdMilli = 100L)
      },
      """WITH b AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n,
        |    min(value) OVER (PARTITION BY event_type) AS lo,
        |    max(value) OVER (PARTITION BY event_type) AS hi
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  SELECT event_type,
        |    least(greatest(CAST(floor((value - lo) /
        |      (CASE WHEN hi = lo THEN 1.0 ELSE (hi - lo) / 10.0 END))
        |      AS BIGINT), 0), 9) AS bin,
        |    rn * 2 <= n AS early
        |  FROM b WHERE n >= 2),
        |cells AS (
        |  SELECT event_type, bin,
        |    CAST(sum(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN NOT early THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM c GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, n1, n2,
        |    CAST(sum(n1) OVER (PARTITION BY event_type) AS BIGINT) AS t1,
        |    CAST(sum(n2) OVER (PARTITION BY event_type) AS BIGINT) AS t2
        |  FROM cells),
        |g AS (
        |  SELECT event_type, max(t1) AS n_early, max(t2) AS n_late,
        |    CAST(sum(abs(n1 * t2 - n2 * t1)) AS BIGINT) AS s
        |  FROM t GROUP BY 1)
        |SELECT event_type, n_early, n_late,
        |  CAST(s AS DOUBLE) / (2.0 * CAST(n_early AS DOUBLE)
        |    * CAST(n_late AS DOUBLE)) AS tvd,
        |  s * 1000 >= 200 * n_early * n_late AS drifted
        |FROM g""".stripMargin),

    // A37 (ext, round 9) — Gini impurity of each user's event-type mix:
    // the no-logarithm diversity index, exact integers + one division.
    "a37_gini_diversity" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        graft.operators.Profiling.giniImpurity(Tables.events(s, dir),
          Seq("user_id"), col("event_type"))
      },
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS nc FROM events
        |  WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |g AS (
        |  SELECT user_id, CAST(sum(nc) AS BIGINT) AS n,
        |    count(*) AS n_cats, CAST(sum(nc * nc) AS BIGINT) AS ss
        |  FROM c GROUP BY 1)
        |SELECT user_id, n, n_cats,
        |  CAST(n * n - ss AS DOUBLE) / CAST(n * n AS DOUBLE) AS gini
        |FROM g""".stripMargin),

    // A34 (ext, round 9) — Poisson-bootstrap confidence intervals for
    // the per-event_type mean: every row draws a deterministic
    // inverse-CDF Poisson(1) weight per replicate from the md5 bucket
    // of "event_id:b" (map-only explode ×80, one aggregate — the
    // cluster-scale bootstrap), replicate means are exact micro-unit
    // ratios, and the 2.5/97.5 bounds are type-1 order statistics.
    // Oracle fully generated from the same tables/ranks — hash match.
    "a34_bootstrap_ci" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        graft.operators.Sampling.poissonBootstrap(Tables.events(s, dir),
          Seq("event_type"), col("event_id"), col("value"),
          replicates = 80, seed = "bs9")
      },
      bootstrapOracle(replicates = 80, seed = "bs9")),

    // A28 (ext, round 9) — isotonic (PAV) probability calibration.
    // Deterministic synthetic scorer: score = value/500 clamped to
    // [0,1]; label drawn by a SECOND independent md5 gate with
    // P(label=1) ≈ value/500 — so the scorer is roughly calibrated
    // with hash noise, and PAV has real violators to pool. The per-bin
    // reliability table is decimal-exact and hash-paired; `calibrated`
    // itself is the driver PAV solve (bounded at ≤ nBins rows, like
    // every model solve), which SQL cannot re-derive — so the oracle
    // pins the PAV OUTPUT through its two defining laws as in-data
    // booleans: monotonicity and label-mass conservation.
    "a28_calibration" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.expressions.Window
        import graft.operators.{Features, Sampling}
        val e = Tables.events(s, dir).filter(col("value").isNotNull)
          .select(
            least(col("value") / lit(500.0), lit(1.0)).as("score"),
            when(Sampling.bucket(col("event_id"), "cal9", "md5") <
              col("value") * lit(2000.0), 1.0).otherwise(0.0).as("label"))
        val bins = Features.isotonicBins(e, col("score"), col("label"),
          nBins = 20)
        // 20-row frame: the single-partition window is bounded by nBins
        val w = Window.orderBy(col("bin"))
        val laws = bins
          .withColumn("prev", lag(col("calibrated"), 1).over(w))
          .agg(
            min(col("prev").isNull || col("calibrated") >= col("prev"))
              .as("monotone_ok"),
            (abs(sum(col("calibrated") * col("n")) -
              sum(col("mean_label") * col("n"))) <=
              lit(1e-6) * sum(col("n"))).as("mass_ok"))
        bins.select(col("bin"), col("n"), col("mean_label"))
          .crossJoin(laws)
      },
      """WITH scored AS (
        |  SELECT least(value / 500.0, 1.0) AS score,
        |    CASE WHEN CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)
        |        || ':cal9'), 1, 15)) AS BIGINT) % 1000000
        |        < value * 2000.0 THEN 1.0 ELSE 0.0 END AS label
        |  FROM events WHERE value IS NOT NULL)
        |SELECT least(CAST(floor(score * 20.0) AS BIGINT), 19) AS bin,
        |  count(*) AS n,
        |  CAST(sum(CAST(label AS DECIMAL(17,6))) AS DOUBLE) / count(*)
        |    AS mean_label,
        |  TRUE AS monotone_ok, TRUE AS mass_ok
        |FROM scored
        |GROUP BY 1""".stripMargin),

    // A29 (ext, round 9) — two-sample A/B z-test: treatment assignment
    // by the deterministic md5 user gate (50/50 on user_id, the
    // experiment-bucketing the hash-sampling family exists for), Welch
    // z on the value metric per event_type. ONE aggregate pass with
    // conditional decimal sums per arm (ar1 ladder); the z statistic
    // and the |z| > 1.96 verdict are fixed IEEE chains — hash-paired,
    // not invariant-boolean'd. Degenerate arms (n < 2 or zero
    // variance) yield NULL z, the SQL convention.
    "a29_ab_ztest" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import graft.operators.Sampling
        val t = Sampling.bucket(col("user_id"), "ab9", "md5") < 500000L
        def d17(c: org.apache.spark.sql.Column) = c.cast("decimal(17,6)")
        def d19(c: org.apache.spark.sql.Column) =
          d17(c).cast("decimal(19,6)")
        val e = Tables.events(s, dir)
          .filter(col("value").isNotNull && abs(col("value")) < 1e11)
        val g = e.groupBy(col("event_type")).agg(
          count(when(t, lit(1))).as("n_t"),
          sum(when(t, d17(col("value")))).as("s_t"),
          sum(when(t, (d19(col("value")) * d19(col("value")))
            .cast("decimal(38,6)"))).as("ss_t"),
          count(when(!t, lit(1))).as("n_c"),
          sum(when(!t, d17(col("value")))).as("s_c"),
          sum(when(!t, (d19(col("value")) * d19(col("value")))
            .cast("decimal(38,6)"))).as("ss_c"))
        def m(sf: String, nf: String) =
          col(sf).cast("double") / col(nf).cast("double")
        def v(ssf: String, sf: String, nf: String) =
          (col(ssf).cast("double") -
            col(sf).cast("double") * col(sf).cast("double") /
              col(nf).cast("double")) /
            (col(nf).cast("double") - lit(1.0))
        val withStats = g
          .withColumn("mean_t", m("s_t", "n_t"))
          .withColumn("mean_c", m("s_c", "n_c"))
          .withColumn("var_t", v("ss_t", "s_t", "n_t"))
          .withColumn("var_c", v("ss_c", "s_c", "n_c"))
          .withColumn("z",
            when(col("n_t") >= 2 && col("n_c") >= 2 &&
              (col("var_t") > 0.0 || col("var_c") > 0.0),
              (col("mean_t") - col("mean_c")) /
                sqrt(col("var_t") / col("n_t").cast("double") +
                  col("var_c") / col("n_c").cast("double"))))
        withStats.select(col("event_type"), col("n_t"), col("n_c"),
          col("mean_t"), col("mean_c"), col("z"),
          (abs(col("z")) > lit(1.96)).as("significant"))
      },
      """WITH e AS (
        |  SELECT event_type, value,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':ab9'),
        |      1, 15)) AS BIGINT) % 1000000 < 500000 AS t
        |  FROM events WHERE value IS NOT NULL AND abs(value) < 1e11),
        |g AS (
        |  SELECT event_type,
        |    count(CASE WHEN t THEN 1 END) AS n_t,
        |    sum(CASE WHEN t THEN CAST(value AS DECIMAL(17,6)) END) AS s_t,
        |    sum(CASE WHEN t THEN CAST(
        |      CAST(CAST(value AS DECIMAL(17,6)) AS DECIMAL(19,6))
        |      * CAST(CAST(value AS DECIMAL(17,6)) AS DECIMAL(19,6))
        |      AS DECIMAL(38,6)) END) AS ss_t,
        |    count(CASE WHEN NOT t THEN 1 END) AS n_c,
        |    sum(CASE WHEN NOT t THEN CAST(value AS DECIMAL(17,6)) END) AS s_c,
        |    sum(CASE WHEN NOT t THEN CAST(
        |      CAST(CAST(value AS DECIMAL(17,6)) AS DECIMAL(19,6))
        |      * CAST(CAST(value AS DECIMAL(17,6)) AS DECIMAL(19,6))
        |      AS DECIMAL(38,6)) END) AS ss_c
        |  FROM e GROUP BY 1),
        |s AS (
        |  SELECT event_type, n_t, n_c,
        |    CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS mean_t,
        |    CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS mean_c,
        |    (CAST(ss_t AS DOUBLE) - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE)
        |      / CAST(n_t AS DOUBLE)) / (CAST(n_t AS DOUBLE) - 1.0) AS var_t,
        |    (CAST(ss_c AS DOUBLE) - CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE)
        |      / CAST(n_c AS DOUBLE)) / (CAST(n_c AS DOUBLE) - 1.0) AS var_c
        |  FROM g)
        |SELECT event_type, n_t, n_c, mean_t, mean_c,
        |  CASE WHEN n_t >= 2 AND n_c >= 2 AND (var_t > 0.0 OR var_c > 0.0)
        |    THEN (mean_t - mean_c) / sqrt(var_t / CAST(n_t AS DOUBLE)
        |      + var_c / CAST(n_c AS DOUBLE)) END AS z,
        |  abs(CASE WHEN n_t >= 2 AND n_c >= 2
        |      AND (var_t > 0.0 OR var_c > 0.0)
        |    THEN (mean_t - mean_c) / sqrt(var_t / CAST(n_t AS DOUBLE)
        |      + var_c / CAST(n_c AS DOUBLE)) END) > 1.96 AS significant
        |FROM s""".stripMargin),

    // A30 (ext, round 9) — chi-square test of independence: does the
    // md5 experiment arm depend on event_type? (It must not — a skewed
    // answer means a broken bucketing hash; this row is the
    // sample-ratio-mismatch check every A/B platform runs.) Full
    // contingency grid including empty cells; the (o−e)²/e reduction
    // rides the BIGINT 1e-9 quantization (the benfordTest grain — per-
    // cell terms up to ~9.2e9 before Int64 saturation), so chi2
    // hash-pairs. Critical value 9.488 = χ²(df=4,
    // α=0.05), supplied by the caller — no CDF in either engine.
    "a30_chi_square" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import graft.operators.{Profiling, Sampling}
        val arm = when(
          Sampling.bucket(col("user_id"), "chi9", "md5") < 500000L,
          "t").otherwise("c")
        Profiling.chiSquareIndependence(Tables.events(s, dir),
          col("event_type"), arm, critical = 9.488)
      },
      """WITH e AS (
        |  SELECT event_type AS r,
        |    CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
        |      || ':chi9'), 1, 15)) AS BIGINT) % 1000000 < 500000
        |      THEN 't' ELSE 'c' END AS c
        |  FROM events WHERE event_type IS NOT NULL),
        |o AS (SELECT r, c, count(*) AS o FROM e GROUP BY 1, 2),
        |grid AS (
        |  SELECT rr.r, cc.c, coalesce(o.o, 0) AS o
        |  FROM (SELECT DISTINCT r FROM o) rr
        |  CROSS JOIN (SELECT DISTINCT c FROM o) cc
        |  LEFT JOIN o ON o.r = rr.r AND o.c = cc.c),
        |w AS (
        |  SELECT r, c, o,
        |    sum(o) OVER () AS n,
        |    sum(o) OVER (PARTITION BY r) AS rt,
        |    sum(o) OVER (PARTITION BY c) AS ct
        |  FROM grid),
        |t AS (
        |  SELECT r, c, n,
        |    CAST(round(((CAST(o AS DOUBLE) - CAST(rt AS DOUBLE)
        |      * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE)
        |      * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |      / CAST(n AS DOUBLE))) * 1e9) AS BIGINT) AS tq
        |  FROM w)
        |SELECT CAST(sum(tq) AS DOUBLE) / 1e9 AS chi2,
        |  CAST((count(DISTINCT r) - 1) * (count(DISTINCT c) - 1)
        |    AS BIGINT) AS dof,
        |  CAST(max(n) AS BIGINT) AS n,
        |  CAST(sum(tq) AS DOUBLE) / 1e9 > 9.488 AS significant
        |FROM t""".stripMargin),

    // A31 (ext, round 9) — one-way ANOVA F: does mean(value) differ by
    // event_type? Completes the stats triad (corr = num×num, chi2 =
    // cat×cat, F = cat×num). Decimal-exact per-group statistics, BIGINT
    // 1e-6 quantized sum-of-squares reduction, fixed IEEE F chain —
    // hash-paired. Critical 2.372 ≈ F(4, ∞, 0.05), caller-supplied.
    "a31_anova_f" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.functions._
        graft.operators.Profiling.anovaF(Tables.events(s, dir),
          col("event_type"), col("value"), critical = 2.372)
      },
      """WITH g AS (
        |  SELECT event_type AS g, count(*) AS n_g,
        |    sum(CAST(value AS DECIMAL(17,6))) AS s_g,
        |    sum(CAST(
        |      CAST(CAST(value AS DECIMAL(17,6)) AS DECIMAL(19,6))
        |      * CAST(CAST(value AS DECIMAL(17,6)) AS DECIMAL(19,6))
        |      AS DECIMAL(38,6))) AS ss_g
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL
        |    AND abs(value) < 1e11
        |  GROUP BY 1),
        |w AS (
        |  SELECT g.*,
        |    sum(n_g) OVER () AS n, sum(s_g) OVER () AS s,
        |    count(*) OVER () AS k
        |  FROM g),
        |m AS (
        |  SELECT n, k,
        |    CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) AS m_g,
        |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
        |    n_g, ss_g
        |  FROM w),
        |t AS (
        |  SELECT n, k,
        |    CAST(round(CAST(n_g AS DOUBLE) * (m_g - m) * (m_g - m) * 1e6)
        |      AS BIGINT) AS bq,
        |    CAST(round((CAST(ss_g AS DOUBLE)
        |      - CAST(n_g AS DOUBLE) * m_g * m_g) * 1e6) AS BIGINT) AS wq
        |  FROM m)
        |SELECT CAST(max(n) AS BIGINT) AS n,
        |  CAST(max(k) - 1 AS BIGINT) AS df1,
        |  CAST(max(n) - max(k) AS BIGINT) AS df2,
        |  CASE WHEN sum(wq) > 0 AND max(k) > 1 AND max(n) > max(k) THEN
        |    (CAST(sum(bq) AS DOUBLE) / 1e6 / CAST(max(k) - 1 AS DOUBLE))
        |    / (CAST(sum(wq) AS DOUBLE) / 1e6
        |       / CAST(max(n) - max(k) AS DOUBLE)) END AS f,
        |  CASE WHEN sum(wq) > 0 AND max(k) > 1 AND max(n) > max(k) THEN
        |    (CAST(sum(bq) AS DOUBLE) / 1e6 / CAST(max(k) - 1 AS DOUBLE))
        |    / (CAST(sum(wq) AS DOUBLE) / 1e6
        |       / CAST(max(n) - max(k) AS DOUBLE)) END > 2.372
        |    AS significant
        |FROM t""".stripMargin),

    // GR1 (ext, round 9) — damped PageRank over the event-type
    // transition graph (edges = per-user consecutive (prev → next)
    // event pairs in (ts, event_id) order). The operator is the generic
    // join+aggregate iteration in Graph.pageRank — no driver adjacency,
    // one shuffle join + one decimal-summed aggregate per round, the
    // shape that runs unchanged on a billion-node graph; the oracle
    // unrolls the same three iterations as CTEs, generated from the
    // same constants so Spark and DuckDB agree bitwise.
    "graph_pagerank" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val edges = Tables.events(s, dir)
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev").as("src"), col("event_type").as("dst"))
          .agg(count(lit(1)).as("w"))
        graft.operators.Graph.pageRank(edges, damping = 0.85, iters = 3)
      },
      pageRankOracle(damping = 0.85, iters = 3)),

    // Personalized PageRank (round 9) — the random walk restarting AT
    // 'signup': which event types are important FROM the signup state's
    // perspective (the related-items/recommendation primitive), on the
    // same transition graph as graph_pagerank; same quantized
    // determinism contract, oracle generated with the source e-vector.
    "graph_ppr" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val edges = Tables.events(s, dir)
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev").as("src"), col("event_type").as("dst"))
          .agg(count(lit(1)).as("w"))
        import s.implicits._
        graft.operators.Graph.personalizedPageRank(edges,
          Seq("signup").toDF("id"), damping = 0.85, iters = 3)
      },
      pprOracle(damping = 0.85, iters = 3, sources = Seq("signup"))),

    // SK4 (ext, round 9) — the MERGEABLE QUANTILE sketch, completing
    // the sketch triad (count-min = occurrences, HLL = distincts,
    // binned histogram = quantiles). Two shards are built against ONE
    // shared grid (histBounds — per-shard grids would not merge),
    // merged by exact integer addition, and served as p50/p90/p99 via
    // the fixed right-edge rank rule. Everything is integer counts +
    // fixed IEEE chains, so unlike the DataSketches HLL row the
    // estimates themselves hash-pair cross-engine; merge_law_ok
    // additionally pins merged == direct-build bin-for-bin in-data.
    "sketch_bin_quantiles" -> QueryDef(
      (s, dir) => {
        import graft.operators.Sketches._
        import org.apache.spark.sql.functions._
        val e = Tables.events(s, dir)
        val g = Seq("event_type")
        val v = col("value")
        val bounds = histBounds(e, g, v, nBins = 32)
        val shards = Seq(0, 1).map(i => binHistogramWith(
          e.filter(pmod(col("event_id"), lit(2)) === i), bounds, g, v, 32))
        val merged = mergeHistograms(shards, g)
        val direct = binHistogram(e, g, v, nBins = 32)
        val law = merged
          .select(col("event_type"), col("bin"), col("cnt").as("cm"))
          .join(direct.select(col("event_type"), col("bin"),
            col("cnt").as("cd")), Seq("event_type", "bin"), "full_outer")
          .agg(min(col("cm") <=> col("cd")).as("merge_law_ok"))
        histQuantiles(merged, g, Seq(0.5, 0.9, 0.99))
          .select(col("event_type"), col("n"), col("q_0").as("p50"),
            col("q_1").as("p90"), col("q_2").as("p99"))
          .crossJoin(law)
      },
      """WITH b AS (
        |  SELECT event_type, min(value) AS lo, max(value) AS hi
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |bw AS (
        |  SELECT event_type, lo,
        |    CASE WHEN hi = lo THEN 1.0 ELSE (hi - lo) / 32.0 END AS width
        |  FROM b),
        |h AS (
        |  SELECT e.event_type,
        |    least(greatest(CAST(floor((e.value - bw.lo) / bw.width)
        |      AS BIGINT), 0), 31) AS bin,
        |    bw.lo AS lo, bw.width AS width, count(*) AS cnt
        |  FROM events e JOIN bw USING (event_type)
        |  WHERE e.value IS NOT NULL
        |  GROUP BY 1, 2, 3, 4),
        |c AS (
        |  SELECT *,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM h)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        |  min(CASE WHEN cum >= CAST(ceil(0.5 * n) AS BIGINT)
        |      THEN lo + (bin + 1) * width END) AS p50,
        |  min(CASE WHEN cum >= CAST(ceil(0.9 * n) AS BIGINT)
        |      THEN lo + (bin + 1) * width END) AS p90,
        |  min(CASE WHEN cum >= CAST(ceil(0.99 * n) AS BIGINT)
        |      THEN lo + (bin + 1) * width END) AS p99,
        |  TRUE AS merge_law_ok
        |FROM c GROUP BY 1""".stripMargin),

    // A27 (ext, round 9) — pairwise Pearson correlation matrix over the
    // lineitem measures in ONE aggregate pass (sufficient statistics
    // per pair; no Expand trap — see Profiling.corrMatrix scaladoc).
    // Decimal-exact sums make the matrix hash-pairable; the oracle SQL
    // is GENERATED from the same pair list so the ladders cannot drift.
    "a27_corr_matrix" -> QueryDef(
      (s, dir) => graft.operators.Profiling.corrMatrix(
        Tables.lineitem(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount")),
      corrOracle(Seq("l_quantity", "l_extendedprice", "l_discount"))),

    // SK3 (ext, round 9) — HLL set-operation estimates: distinct-user
    // overlap between two behavioral segments via inclusion–exclusion
    // (|A∩B| ≈ est(A)+est(B)−est(A∪B)) — the audience-overlap question
    // sketches answer at 100 TB without a distinct-join. hll_union is
    // the pairwise (non-agg) merge of two persisted sketch artifacts.
    // Estimates are sketch-internal, so as with sketch_hll_union the
    // registered row hash-pins EXACT counts and in-data tolerance
    // booleans (intersection error is relative to the UNION size, the
    // standard inclusion–exclusion caveat).
    "sketch_hll_intersect" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val e = Tables.events(s, dir)
        val a = e.filter(col("event_type") === "purchase")
        val b = e.filter(col("event_type") === "click")
        val sk = a.agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk_a"),
            count_distinct(col("user_id")).as("n_a"))
          .crossJoin(b.agg(
            hll_sketch_agg(col("user_id"), lit(12)).as("sk_b"),
            count_distinct(col("user_id")).as("n_b")))
        val exact = a.select(col("user_id"))
          .intersect(b.select(col("user_id")))
          .agg(count(lit(1)).as("n_intersect"))
          .crossJoin(a.select(col("user_id")).union(b.select(col("user_id")))
            .distinct().agg(count(lit(1)).as("n_union")))
        sk.crossJoin(exact)
          .select(col("n_a"), col("n_b"), col("n_union"), col("n_intersect"),
            (abs(hll_sketch_estimate(col("sk_a"))
              + hll_sketch_estimate(col("sk_b"))
              - hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b")))
              - col("n_intersect")) <= lit(0.05) * col("n_union"))
              .as("intersect_ok"))
      },
      """WITH a AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_type = 'purchase'),
        |b AS (SELECT DISTINCT user_id FROM events
        |      WHERE event_type = 'click')
        |SELECT (SELECT count(*) FROM a) AS n_a,
        |  (SELECT count(*) FROM b) AS n_b,
        |  (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
        |    AS n_union,
        |  (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
        |    AS n_intersect,
        |  TRUE AS intersect_ok""".stripMargin),

    // EV1 — ordered funnel: users reaching each stage with all prior
    // stages completed in (ts, event_id) order. The oracle re-derives
    // each stage's per-user first-completion time via row_number + a
    // row-value comparison — an independent formulation of the same
    // strict ordering the Spark side expresses with struct min/joins.
    "ev1_funnel" -> QueryDef(
      (s, dir) => EventAnalytics.funnel(Tables.events(s, dir), funnelStages),
      """WITH base AS (
        |  SELECT user_id, event_type, ts, event_id FROM events
        |  WHERE event_type IN ('signup', 'view', 'click', 'purchase')),
        |s1 AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT user_id, ts, event_id,
        |      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |    FROM base WHERE event_type = 'signup') WHERE rn = 1),
        |s2 AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT e.user_id, e.ts, e.event_id,
        |      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
        |    FROM base e JOIN s1 ON e.user_id = s1.user_id
        |    WHERE e.event_type = 'view'
        |      AND (e.ts, e.event_id) > (s1.ts, s1.event_id)) WHERE rn = 1),
        |s3 AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT e.user_id, e.ts, e.event_id,
        |      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
        |    FROM base e JOIN s2 ON e.user_id = s2.user_id
        |    WHERE e.event_type = 'click'
        |      AND (e.ts, e.event_id) > (s2.ts, s2.event_id)) WHERE rn = 1),
        |s4 AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT e.user_id, e.ts, e.event_id,
        |      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
        |    FROM base e JOIN s3 ON e.user_id = s3.user_id
        |    WHERE e.event_type = 'purchase'
        |      AND (e.ts, e.event_id) > (s3.ts, s3.event_id)) WHERE rn = 1)
        |SELECT CAST(1 AS INT) AS stage, 'signup' AS stage_name,
        |  (SELECT count(*) FROM s1) AS users
        |UNION ALL SELECT CAST(2 AS INT), 'view', (SELECT count(*) FROM s2)
        |UNION ALL SELECT CAST(3 AS INT), 'click', (SELECT count(*) FROM s3)
        |UNION ALL SELECT CAST(4 AS INT), 'purchase', (SELECT count(*) FROM s4)""".stripMargin),

    // EV2 — weekly cohort retention: cohort = ISO week of first event,
    // active_users per whole-week offset. Monday week truncation agrees
    // between Spark and DuckDB; offsets are exact integer day-div-7.
    "ev2_retention" -> QueryDef(
      (s, dir) => EventAnalytics.retentionCohorts(Tables.events(s, dir), "week"),
      """WITH f AS (
        |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS period
        |  FROM events)
        |SELECT cohort,
        |  CAST(datediff('day', cohort, period) // 7 AS INT) AS period_offset,
        |  count(*) AS active_users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin),

    // EV3 — journey paths: the first 8 event types per user in strict
    // (ts, event_id) order joined with '>', counted across users. The
    // Spark side sorts (rn, type) pairs post-collect (collect_list order
    // is nondeterministic); the oracle uses ORDER BY inside string_agg.
    "ev3_journeys" -> QueryDef(
      (s, dir) => EventAnalytics.journeys(Tables.events(s, dir), maxSteps = 8),
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 8 GROUP BY user_id)
        |SELECT path, count(*) AS n_users FROM p GROUP BY path""".stripMargin),

    // Count-min sketch (Sketches.countMin/cmsEstimate): build a 4×64
    // counter matrix over events.user_id, estimate every distinct user's
    // event count from the sketch, grade against the exact count. The
    // md5 cell hashing is the engine's cross-engine convention, so the
    // oracle re-derives the ENTIRE sketch (build + min-estimate) and the
    // compare is a full hash match — est is deterministic, over_ok pins
    // the one-sided error contract in-data. Width 64 << distinct users'
    // spread guarantees real collisions at sf0.01+, so the row proves
    // overestimates happen AND stay one-sided.
    "sketch_count_min" -> QueryDef(
      (s, dir) => {
        import graft.operators.Sketches
        import org.apache.spark.sql.functions._
        val e = Tables.events(s, dir)
        val sk = Sketches.countMin(e, col("user_id"),
          width = 64, depth = 4, seed = "cms8")
        val est = Sketches.cmsEstimate(sk, e, col("user_id"),
          width = 64, depth = 4, seed = "cms8")
        val truth = e.groupBy(col("user_id").as("key"))
          .agg(count(lit(1)).as("true_n"))
        est.join(truth, "key")
          .select(col("key").as("user_id"), col("est"), col("true_n"),
            (col("est") >= col("true_n")).as("over_ok"))
      },
      """WITH cells AS (
        |  SELECT user_id, i.i AS sk_row,
        |    CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR) || ':' ||
        |      CAST(user_id AS VARCHAR) || ':cms8'), 1, 15)) AS BIGINT) % 64
        |      AS sk_col
        |  FROM events, LATERAL unnest(generate_series(0, 3)) AS i(i)),
        |sketch AS (
        |  SELECT sk_row, sk_col, count(*) AS c FROM cells GROUP BY 1, 2),
        |probe AS (SELECT DISTINCT user_id, sk_row, sk_col FROM cells),
        |est AS (
        |  SELECT p.user_id, min(coalesce(s.c, 0)) AS est
        |  FROM probe p LEFT JOIN sketch s USING (sk_row, sk_col)
        |  GROUP BY p.user_id),
        |truth AS (SELECT user_id, count(*) AS true_n FROM events GROUP BY 1)
        |SELECT user_id, est, true_n, est >= true_n AS over_ok
        |FROM est JOIN truth USING (user_id)""".stripMargin),

    // HLL sketch artifacts (round 9) — the OTHER mergeable sketch the
    // 100 TB playbook needs (count-min counts occurrences; HLL counts
    // DISTINCTs): per-shard sketches built once (here one per
    // event_type via the built-in Apache DataSketches hll_sketch_agg —
    // kilobytes each, the persistable artifact), merged WITHOUT
    // re-scanning data via hll_union_agg. The key law this row pins
    // in-data: merging the per-shard sketches estimates the SAME global
    // distinct count as sketching the whole corpus directly — the
    // property that lets a 1000-executor fleet sketch partitions
    // independently and combine results, and lets daily sketches roll
    // up to monthly without touching raw data. Estimates are
    // sketch-internal (no oracle re-derivation), so the registered
    // output is exact distincts (hash-matched) + tolerance/merge-law
    // booleans, the a11/ANN invariant convention; at the driver's
    // cardinalities (≤1500) lgK=12 keeps the sketch in exact mode, and
    // the 2%/5% tolerances cover the estimation regime beyond.
    "sketch_hll_union" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val e = Tables.events(s, dir)
        val perType = e.groupBy(col("event_type"))
          .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
            count_distinct(col("user_id")).as("n_exact"))
        val laws = perType
          .agg(hll_sketch_estimate(
            hll_union_agg(col("sk"))).as("est_union"))
          .crossJoin(e.agg(
            hll_sketch_estimate(
              hll_sketch_agg(col("user_id"), lit(12))).as("est_direct"),
            count_distinct(col("user_id")).as("n_global")))
          .select(
            (abs(col("est_union") - col("est_direct")) <=
              lit(0.02) * col("n_global")).as("merge_law_ok"),
            (abs(col("est_union") - col("n_global")) <=
              lit(0.05) * col("n_global")).as("global_est_ok"))
        perType
          .select(col("event_type"), col("n_exact"),
            (abs(hll_sketch_estimate(col("sk")) - col("n_exact")) <=
              lit(0.05) * col("n_exact")).as("type_est_ok"))
          .crossJoin(laws)
      },
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |  TRUE AS type_est_ok, TRUE AS merge_law_ok, TRUE AS global_est_ok
        |FROM events GROUP BY 1""".stripMargin),

    // Bloom membership sketch (round 9) — the FOURTH mergeable sketch
    // family (count-min = occurrences, HLL = distincts, histogram =
    // quantiles, bloom = MEMBERSHIP). Members are users with
    // user_id % 7 == 0 (a deterministic subset both engines derive
    // identically — the events data has every user purchasing, so no
    // natural predicate yields a strict subset); probes are ALL users.
    // bits = 128 is deliberately tight (≈21 members × 3 hashes at
    // sf0.01) so REAL false positives occur among the ~129 non-member
    // probes — proving the error is one-sided in data, not just in
    // theory. The md5 bit derivation is the engine's cross-engine
    // convention: the oracle re-derives the ENTIRE bit set and every
    // probe answer — a full hash match, not an invariant boolean. The
    // merge law (OR of parity-shard sketches ≡ the direct sketch) is
    // exact set algebra, pinned in-plan via a full-outer bit diff.
    "sketch_bloom" -> QueryDef(
      (s, dir) => {
        import graft.operators.Sketches
        import org.apache.spark.sql.functions._
        val e = Tables.events(s, dir)
        val members = e.filter(pmod(col("user_id"), lit(7)) === 0)
        val direct = Sketches.bloom(members, col("user_id"),
          bits = 128, hashes = 3, seed = "bl9")
        val merged = Sketches.mergeBlooms(Seq(0, 1).map(par =>
          Sketches.bloom(members.filter(pmod(col("event_id"), lit(2)) === par),
            col("user_id"), bits = 128, hashes = 3, seed = "bl9")))
        val law = direct.withColumn("__a", lit(1))
          .join(merged.withColumn("__b", lit(1)), Seq("bit"), "full_outer")
          .agg(coalesce(sum(when(col("__a").isNull || col("__b").isNull,
            lit(1)).otherwise(lit(0))), lit(0L)).as("__nd"))
          .select((col("__nd") === 0).as("merge_law_ok"))
        Sketches.bloomMightContain(direct, e, col("user_id"),
          bits = 128, hashes = 3, seed = "bl9")
          .withColumnRenamed("key", "user_id")
          .withColumn("truly_in", pmod(col("user_id"), lit(7)) === 0)
          .select(col("user_id"), col("might_contain"), col("truly_in"),
            (!col("truly_in") || col("might_contain")).as("one_sided_ok"))
          .crossJoin(law)
      },
      """WITH members AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE user_id IS NOT NULL AND user_id % 7 = 0),
        |bits AS (
        |  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR)
        |    || ':' || CAST(user_id AS VARCHAR) || ':bl9'), 1, 15))
        |    AS BIGINT) % 128 AS bit
        |  FROM members, LATERAL unnest(generate_series(0, 2)) AS i(i)),
        |probes AS (
        |  SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
        |pb AS (
        |  SELECT user_id, CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR)
        |    || ':' || CAST(user_id AS VARCHAR) || ':bl9'), 1, 15))
        |    AS BIGINT) % 128 AS bit
        |  FROM probes, LATERAL unnest(generate_series(0, 2)) AS i(i)),
        |mc AS (
        |  SELECT p.user_id, count(b.bit) = 3 AS might_contain
        |  FROM pb p LEFT JOIN bits b USING (bit) GROUP BY p.user_id)
        |SELECT user_id, might_contain, user_id % 7 = 0 AS truly_in,
        |  (NOT user_id % 7 = 0) OR might_contain AS one_sided_ok,
        |  TRUE AS merge_law_ok
        |FROM mc""".stripMargin),

    // Triangle counting + local clustering coefficient (round 9) over
    // the co-purchase graph: parts are connected when they appear in
    // the same order in >= 2 distinct orders (the support floor keeps
    // the graph at real-signal pairs — and keeps the oracle's naive
    // triple-join tractable). The Spark side runs the degree-oriented
    // node-iterator (each triangle found exactly once at its
    // orientation-minimum corner, out-degrees O(sqrt(m))-bounded); the
    // oracle enumerates naively by node order — two different
    // algorithms agreeing on exact integers, plus ONE hash-stable IEEE
    // division for the coefficient.
    "graph_triangles" -> QueryDef(
      (s, dir) => {
        import graft.operators.Graph
        import org.apache.spark.sql.functions._
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val edges = li.select(col("ok"), col("pk").as("src"))
          .join(li.select(col("ok"), col("pk").as("dst")), "ok")
          .filter(col("src") < col("dst"))
          .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
          .filter(col("w") >= 2).select(col("src"), col("dst"))
        Graph.triangles(edges).withColumnRenamed("id", "l_partkey")
      },
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (
        |  SELECT a.pk AS src, b2.pk AS dst
        |  FROM b a JOIN b b2 ON a.ok = b2.ok AND a.pk < b2.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (
        |  SELECT id, count(*) AS degree FROM (
        |    SELECT src AS id FROM e UNION ALL SELECT dst FROM e)
        |  GROUP BY 1),
        |t AS (
        |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        |  FROM e e1
        |  JOIN e e2 ON e1.dst = e2.src
        |  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
        |pn AS (
        |  SELECT id, count(*) AS triangles FROM (
        |    SELECT a AS id FROM t UNION ALL SELECT b FROM t
        |    UNION ALL SELECT c FROM t)
        |  GROUP BY 1)
        |SELECT deg.id AS l_partkey, deg.degree,
        |  coalesce(pn.triangles, CAST(0 AS BIGINT)) AS triangles,
        |  CASE WHEN deg.degree >= 2 THEN
        |    CAST(coalesce(pn.triangles, 0) * 2 AS DOUBLE)
        |      / CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
        |  END AS lcc
        |FROM deg LEFT JOIN pn USING (id)""".stripMargin),

    // Connected components (round 9) — the large/small-star operator
    // (Dedup.connectedComponents, built for near-dup clustering) exposed
    // on the co-purchase graph. The oracle is a genuinely DIFFERENT
    // algorithm: WITH RECURSIVE min-label propagation to fixpoint —
    // exact integer labels, so agreement is bitwise.
    "graph_components" -> QueryDef(
      (s, dir) => {
        import graft.operators.Dedup
        import org.apache.spark.sql.functions._
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val edges = li.select(col("ok"), col("pk").as("src"))
          .join(li.select(col("ok"), col("pk").as("dst")), "ok")
          .filter(col("src") < col("dst"))
          .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
          .filter(col("w") >= 2).select(col("src"), col("dst"))
        Dedup.connectedComponents(edges, src = "src", dst = "dst")
          .withColumnRenamed("node", "l_partkey")
      },
      """WITH RECURSIVE
        |b AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (
        |  SELECT a.pk AS src, b2.pk AS dst
        |  FROM b a JOIN b b2 ON a.ok = b2.ok AND a.pk < b2.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (
        |  SELECT src AS u, dst AS v FROM e
        |  UNION SELECT dst, src FROM e),
        |walk(node, lbl) AS (
        |  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
        |  UNION
        |  SELECT s.v, w.lbl FROM walk w JOIN sym s ON s.u = w.node
        |  WHERE w.lbl < s.v)
        |SELECT node AS l_partkey, min(lbl) AS component
        |FROM walk GROUP BY 1""".stripMargin),

    // Bounded-hop BFS (round 9) — frontier-expand distances from the
    // graph's smallest part over the same co-purchase edges, 4 hops.
    // Exact integer distances; the oracle walks the graph by recursive
    // CTE instead of frontier joins — two algorithms, one answer.
    "graph_bfs_dist" -> QueryDef(
      (s, dir) => {
        import graft.operators.Graph
        import org.apache.spark.sql.functions._
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val edges = li.select(col("ok"), col("pk").as("src"))
          .join(li.select(col("ok"), col("pk").as("dst")), "ok")
          .filter(col("src") < col("dst"))
          .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
          .filter(col("w") >= 2).select(col("src"), col("dst"))
        val source = edges
          .select(least(col("src"), col("dst")).as("id"))
          .agg(min(col("id")).as("id"))
        Graph.bfsDistances(edges, source, maxHops = 4)
      },
      """WITH RECURSIVE
        |b AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (
        |  SELECT a.pk AS src, b2.pk AS dst
        |  FROM b a JOIN b b2 ON a.ok = b2.ok AND a.pk < b2.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (
        |  SELECT src AS u, dst AS v FROM e
        |  UNION SELECT dst, src FROM e),
        |s0 AS (SELECT min(u) AS id FROM sym),
        |walk(node, d) AS (
        |  SELECT id, CAST(0 AS BIGINT) FROM s0
        |  UNION
        |  SELECT s.v, w.d + 1 FROM walk w JOIN sym s ON s.u = w.node
        |  WHERE w.d < 4)
        |SELECT node AS id, min(d) AS dist FROM walk GROUP BY 1""".stripMargin),

    // EV5 (round 9) — the ordered funnel under a CONVERSION WINDOW:
    // each stage must fire within 2 days of the previous stage's reach
    // (greedy-from-first semantics, the ev1 chain + a bound per step).
    // 150 → 81 users survive signup→view at sf0.01 vs 150 unbounded —
    // the window genuinely bites.
    "ev5_funnel_windowed" -> QueryDef(
      (s, dir) => EventAnalytics.funnelWindowed(Tables.events(s, dir),
        funnelStages, maxGapDays = Some(2)),
      """WITH base AS (
        |  SELECT user_id, event_type, ts, event_id FROM events
        |  WHERE event_type IN ('signup', 'view', 'click', 'purchase')),
        |s1 AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT user_id, ts, event_id,
        |      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |    FROM base WHERE event_type = 'signup') WHERE rn = 1),
        |s2 AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT e.user_id, e.ts, e.event_id,
        |      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
        |    FROM base e JOIN s1 ON e.user_id = s1.user_id
        |    WHERE e.event_type = 'view'
        |      AND (e.ts, e.event_id) > (s1.ts, s1.event_id)
        |      AND e.ts <= s1.ts + INTERVAL 2 DAY) WHERE rn = 1),
        |s3 AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT e.user_id, e.ts, e.event_id,
        |      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
        |    FROM base e JOIN s2 ON e.user_id = s2.user_id
        |    WHERE e.event_type = 'click'
        |      AND (e.ts, e.event_id) > (s2.ts, s2.event_id)
        |      AND e.ts <= s2.ts + INTERVAL 2 DAY) WHERE rn = 1),
        |s4 AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT e.user_id, e.ts, e.event_id,
        |      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
        |    FROM base e JOIN s3 ON e.user_id = s3.user_id
        |    WHERE e.event_type = 'purchase'
        |      AND (e.ts, e.event_id) > (s3.ts, s3.event_id)
        |      AND e.ts <= s3.ts + INTERVAL 2 DAY) WHERE rn = 1)
        |SELECT 1 AS stage, 'signup' AS stage_name,
        |  (SELECT count(*) FROM s1) AS users
        |UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
        |UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
        |UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4)""".stripMargin),

    // EV7 (round 9) — funnel time-to-convert: per adjacent stage pair,
    // how long converting users took (exact microsecond deltas between
    // greedy reach times; LOWER-median + decimal-exact mean — the two
    // numbers a growth team reads first). Composed on funnelReaches,
    // the per-user relation the counts-only funnel aggregates away.
    "ev7_funnel_ttc" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.expressions.Window
        val reaches = EventAnalytics.funnelReaches(
          Tables.events(s, dir), funnelStages)
        val nxt = reaches.select((col("stage") - 1).as("stage"),
          col("user_id"), col("stage_name").as("to_name"),
          col("reach_ts").as("next_ts"))
        val deltas = reaches
          .select(col("stage"), col("stage_name").as("from_name"),
            col("user_id"), col("reach_ts"))
          .join(nxt, Seq("stage", "user_id"))
          .withColumn("d",
            unix_micros(col("next_ts").cast("timestamp")) -
              unix_micros(col("reach_ts").cast("timestamp")))
        val w = Window.partitionBy(col("stage"))
        val ranked = deltas
          .withColumn("rk", row_number().over(
            w.orderBy(col("d"), col("user_id"))).cast("long"))
          .withColumn("n", count(lit(1)).over(w.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
          .withColumn("sd", sum(col("d")).over(w.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        ranked.groupBy(col("stage").as("from_stage"), col("from_name"),
          col("to_name"))
          .agg(max(col("n")).as("n"),
            (max(when(col("rk") === expr("(n + 1) div 2"), col("d")))
              .cast("double") / lit(1e6)).as("median_secs"),
            (max(col("sd")).cast("double") / max(col("n")).cast("double") /
              lit(1e6)).as("mean_secs"))
      },
      """WITH base AS (
        |  SELECT user_id, event_type, ts, event_id FROM events
        |  WHERE event_type IN ('signup', 'view', 'click', 'purchase')),
        |s1 AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT user_id, ts, event_id,
        |      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |    FROM base WHERE event_type = 'signup') WHERE rn = 1),
        |s2 AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT e.user_id, e.ts, e.event_id,
        |      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
        |    FROM base e JOIN s1 ON e.user_id = s1.user_id
        |    WHERE e.event_type = 'view'
        |      AND (e.ts, e.event_id) > (s1.ts, s1.event_id)) WHERE rn = 1),
        |s3 AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT e.user_id, e.ts, e.event_id,
        |      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
        |    FROM base e JOIN s2 ON e.user_id = s2.user_id
        |    WHERE e.event_type = 'click'
        |      AND (e.ts, e.event_id) > (s2.ts, s2.event_id)) WHERE rn = 1),
        |s4 AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT e.user_id, e.ts, e.event_id,
        |      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
        |    FROM base e JOIN s3 ON e.user_id = s3.user_id
        |    WHERE e.event_type = 'purchase'
        |      AND (e.ts, e.event_id) > (s3.ts, s3.event_id)) WHERE rn = 1),
        |pairs AS (
        |  SELECT 1 AS from_stage, 'signup' AS from_name, 'view' AS to_name,
        |    s1.user_id, epoch_us(s2.ts) - epoch_us(s1.ts) AS d
        |  FROM s1 JOIN s2 USING (user_id)
        |  UNION ALL
        |  SELECT 2, 'view', 'click', s2.user_id,
        |    epoch_us(s3.ts) - epoch_us(s2.ts)
        |  FROM s2 JOIN s3 USING (user_id)
        |  UNION ALL
        |  SELECT 3, 'click', 'purchase', s3.user_id,
        |    epoch_us(s4.ts) - epoch_us(s3.ts)
        |  FROM s3 JOIN s4 USING (user_id)),
        |r AS (
        |  SELECT from_stage, from_name, to_name, d,
        |    CAST(row_number() OVER (PARTITION BY from_stage
        |      ORDER BY d, user_id) AS BIGINT) AS rk,
        |    CAST(count(*) OVER (PARTITION BY from_stage) AS BIGINT) AS n,
        |    CAST(sum(d) OVER (PARTITION BY from_stage) AS BIGINT) AS sd
        |  FROM pairs)
        |SELECT from_stage, from_name, to_name, max(n) AS n,
        |  CAST(max(CASE WHEN rk = (n + 1) // 2 THEN d END) AS DOUBLE)
        |    / 1e6 AS median_secs,
        |  CAST(max(sd) AS DOUBLE) / CAST(max(n) AS DOUBLE) / 1e6
        |    AS mean_secs
        |FROM r GROUP BY 1, 2, 3""".stripMargin),

    // EV6 (round 9) — exact audience overlap: segments are "users with
    // ≥ 15 events of type t" (sizes 50-57 at sf0.01, intersections
    // 16-27 — real structure, not the degenerate everyone-everywhere);
    // |A∩B| by self-join, |A∪B| by inclusion-exclusion, Jaccard one
    // exact division. The EXACT face of sketch_hll_intersect.
    "ev6_audience_overlap" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val aud = Tables.events(s, dir)
          .filter(col("event_type").isNotNull && col("user_id").isNotNull)
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") >= 15)
          .select(col("event_type"), col("user_id"))
        val inter = aud.select(col("event_type").as("t1"), col("user_id"))
          .join(aud.select(col("event_type").as("t2"), col("user_id")),
            "user_id")
          .filter(col("t1") < col("t2"))
          .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("n_inter"))
        val sizes = aud.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"))
        inter
          .join(sizes.select(col("event_type").as("t1"),
            col("n").as("n_a")), "t1")
          .join(sizes.select(col("event_type").as("t2"),
            col("n").as("n_b")), "t2")
          .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
          .select(col("t1"), col("t2"), col("n_a"), col("n_b"),
            col("n_inter"), col("n_union"),
            (col("n_inter").cast("double") / col("n_union").cast("double"))
              .as("jaccard"))
      },
      """WITH c AS (
        |  SELECT event_type, user_id, count(*) AS n FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY 1, 2),
        |a AS (SELECT event_type, user_id FROM c WHERE n >= 15),
        |s AS (SELECT event_type, count(*) AS n FROM a GROUP BY 1),
        |i AS (
        |  SELECT x.event_type AS t1, y.event_type AS t2, count(*) AS n_inter
        |  FROM a x JOIN a y
        |    ON x.user_id = y.user_id AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT i.t1, i.t2, sa.n AS n_a, sb.n AS n_b, i.n_inter,
        |  sa.n + sb.n - i.n_inter AS n_union,
        |  CAST(i.n_inter AS DOUBLE)
        |    / CAST(sa.n + sb.n - i.n_inter AS DOUBLE) AS jaccard
        |FROM i JOIN s sa ON sa.event_type = i.t1
        |JOIN s sb ON sb.event_type = i.t2""".stripMargin),

    // EV4 (round 9) — first-order Markov next-event model: MLE
    // transition matrix over per-user event sequences with a
    // deterministic (n DESC, dst ASC) next-event ranking. Counts and
    // totals are exact integers; p is ONE exactly-rounded division.
    "ev4_markov" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.functions._
        EventAnalytics.markovTransitions(Tables.events(s, dir))
          .withColumn("rnk", col("rnk").cast("long"))
      },
      """WITH l AS (
        |  SELECT event_type AS dst,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS src
        |  FROM events),
        |c AS (
        |  SELECT src, dst, count(*) AS n FROM l
        |  WHERE src IS NOT NULL GROUP BY 1, 2),
        |w AS (
        |  SELECT src, dst, n,
        |    CAST(sum(n) OVER (PARTITION BY src) AS BIGINT) AS n_src
        |  FROM c)
        |SELECT src, dst, n, n_src,
        |  CAST(n AS DOUBLE) / CAST(n_src AS DOUBLE) AS p,
        |  row_number() OVER (PARTITION BY src ORDER BY n DESC, dst) AS rnk
        |FROM w""".stripMargin),

    // Market-basket association rules (round 9; re-registered round 12
    // at a support level where the apriori prune ACTUALLY prunes — the
    // round-11 verdict's top item): baskets are user-DAY sessions over
    // `events`, items are the session's event types (the frequent head:
    // 5 items, each in ~40% of sessions, genuinely co-occurring) UNION
    // its 'k<NN>' props tags (the long tail: ~100 items, each in ~2.4%
    // of sessions). RELATIVE support 50‰ of n_baskets (the only
    // scale-invariant formulation — see pairRulesRel) prunes the entire
    // tail (105 items → 5 frequent) and cuts the pair-join cardinality
    // Σ C(sz,2) 7× BEFORE pairing; mb_assoc_prune_stats publishes that
    // effect as data. Confidence ≥ 0.10 by INTEGER cross-multiply;
    // confidence and lift are each one exactly-rounded division of
    // exact integers. The oracle re-derives every rule naively.
    "mb_assoc_rules" -> QueryDef(
      (s, dir) => {
        import graft.operators.Association
        Association.pairRulesRel(assocBaskets(s, dir), "bk", "it",
          minSupportMilli = 50L, minConfMilli = 100L)
      },
      s"""WITH raw AS ($assocBasketSql),
        |b AS (SELECT DISTINCT bk, it FROM raw),
        |nb AS (SELECT count(DISTINCT bk) AS n_baskets FROM b),
        |ic AS (SELECT it, count(*) AS ni FROM b GROUP BY 1),
        |bf AS (
        |  SELECT bk, it FROM b WHERE it IN
        |    (SELECT it FROM ic
        |     WHERE 1000 * ni >= 50 * (SELECT n_baskets FROM nb))),
        |pc AS (
        |  SELECT a.it AS i1, c.it AS i2, count(*) AS np
        |  FROM bf a JOIN bf c ON a.bk = c.bk AND a.it < c.it
        |  GROUP BY 1, 2
        |  HAVING 1000 * count(*) >= 50 * (SELECT n_baskets FROM nb)),
        |r AS (
        |  SELECT i1 AS antecedent, i2 AS consequent, np FROM pc
        |  UNION ALL SELECT i2, i1, np FROM pc)
        |SELECT r.antecedent, r.consequent, r.np AS n_pair,
        |  ia.ni AS n_ante, ik.ni AS n_cons,
        |  (SELECT n_baskets FROM nb) AS n_baskets,
        |  CAST(r.np AS DOUBLE) / CAST(ia.ni AS DOUBLE) AS confidence,
        |  CAST(r.np * (SELECT n_baskets FROM nb) AS DOUBLE)
        |    / CAST(ia.ni * ik.ni AS DOUBLE) AS lift
        |FROM r
        |JOIN ic ia ON ia.it = r.antecedent
        |JOIN ic ik ON ik.it = r.consequent
        |WHERE 1000 * r.np >= 100 * ia.ni""".stripMargin),

    // The prune's effect AS DATA (round 12): one row proving the 50‰
    // registration above defends the pair join — n_pruned = 100 of 105
    // items, pairs_before/pairs_after the exact Σ C(sz,2) cardinalities
    // without/with the prune. The registration-audit contract: a
    // support setting whose stats row showed n_pruned = 0 AND
    // pairs_after = pairs_before would be decorative (the round-11
    // minSupport=2 failure mode, caught by exactly this row).
    "mb_assoc_prune_stats" -> QueryDef(
      (s, dir) => {
        import graft.operators.Association
        Association.pruneStats(assocBaskets(s, dir), "bk", "it",
          minSupportMilli = 50L)
      },
      s"""WITH raw AS ($assocBasketSql),
        |b AS (SELECT DISTINCT bk, it FROM raw),
        |nb AS (SELECT count(DISTINCT bk) AS n_baskets FROM b),
        |ic AS (SELECT it, count(*) AS ni FROM b GROUP BY 1),
        |f AS (SELECT it FROM ic
        |      WHERE 1000 * ni >= 50 * (SELECT n_baskets FROM nb)),
        |bf AS (SELECT bk, it FROM b WHERE it IN (SELECT it FROM f)),
        |pb AS (SELECT CAST(coalesce(sum(sz * (sz - 1)), 0) / 2 AS BIGINT)
        |         AS pairs_before
        |       FROM (SELECT count(*) AS sz FROM b GROUP BY bk)),
        |pa AS (SELECT CAST(coalesce(sum(sz * (sz - 1)), 0) / 2 AS BIGINT)
        |         AS pairs_after
        |       FROM (SELECT count(*) AS sz FROM bf GROUP BY bk))
        |SELECT (SELECT n_baskets FROM nb) AS n_baskets,
        |  (SELECT count(*) FROM ic) AS n_items,
        |  (SELECT count(*) FROM f) AS n_frequent,
        |  (SELECT count(*) FROM ic) - (SELECT count(*) FROM f) AS n_pruned,
        |  (SELECT pairs_before FROM pb) AS pairs_before,
        |  (SELECT pairs_after FROM pa) AS pairs_after""".stripMargin))

  /** The shared basket relation for the mb_assoc_* rows: user-day
    * sessions × (event-type head items ∪ 'k<NN>' props-tag tail items).
    * Both item families ride the same (bk, it) shape; the 'k' prefix
    * keeps the tag domain disjoint from event types. */
  private def assocBaskets(s: org.apache.spark.sql.SparkSession,
                           dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    // spread before the per-row JSON parse + date-cast basket keying —
    // CPU-dense work that otherwise runs on the single scan split
    // (round 16, guide §2.5; no-op when the scan is cluster-wide)
    val e = graft.operators.Dedup.spread(Tables.events(s, dir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull))
    val bk = concat(col("user_id").cast("string"), lit("_"),
      col("ts").cast("date").cast("string"))
    e.filter(col("event_type").isNotNull)
      .select(bk.as("bk"), col("event_type").as("it"))
      .unionByName(
        e.filter(col("props").isNotNull &&
            get_json_object(col("props"), "$.k").isNotNull)
          .select(bk.as("bk"),
            concat(lit("k"), get_json_object(col("props"), "$.k")).as("it")))
  }

  /** DuckDB twin of [[assocBaskets]] (a CTE body, no trailing paren).
    * A `def`, not a `val`: the `defs` map above interpolates this at
    * ITS OWN initialization, and a later-declared val would still be
    * null at that point. */
  private def assocBasketSql: String =
    """SELECT CAST(user_id AS VARCHAR) || '_' ||
      |    CAST(CAST(ts AS DATE) AS VARCHAR) AS bk, event_type AS it
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND event_type IS NOT NULL
      |  UNION ALL
      |  SELECT CAST(user_id AS VARCHAR) || '_' ||
      |    CAST(CAST(ts AS DATE) AS VARCHAR),
      |    'k' || json_extract_string(props, '$.k')
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND props IS NOT NULL
      |    AND json_extract_string(props, '$.k') IS NOT NULL""".stripMargin
}
