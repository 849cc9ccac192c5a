package graft

import org.apache.spark.sql.functions._

import graft.operators.{Features, Sampling, TextAnalysis}

/** The trained-quality-gate composition behind `ext_quality_model`:
  * hashedBowWide featurizer cross-checked against its sparse sibling,
  * and the distributed ridge-IRLS fit differentialed against an
  * INDEPENDENT in-memory driver refit on the exact same design matrix. */
class QualityModelSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"
  private val nBuckets = 16

  test("hashedBowWide equals the sparse hashedBagOfWords pivoted wide") {
    val docs = Tables.documents(spark, sf)
    val wide = TextAnalysis.hashedBowWide(docs, nBuckets, "r9q", "md5")
      .collect().map(r => r.getLong(0) ->
        (0 until nBuckets).map(i => r.getLong(i + 1)).toVector).toMap
    val sparse = TextAnalysis.hashedBagOfWords(docs, nBuckets, "r9q", "md5")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        val m = rows.map(r => r.getLong(1).toInt -> r.getLong(2)).toMap
        id -> (0 until nBuckets).map(i => m.getOrElse(i, 0L)).toVector
      }
    assert(wide.keySet === sparse.keySet)
    wide.foreach { case (id, v) => assert(v === sparse(id), s"doc $id") }
    // every doc keeps a row, even empty/null text
    assert(wide.size === docs.count())
  }

  /** Independent in-memory ridge-IRLS: same math as Features.logisticFit
    * (weight floor 1e-6, ridge·n on non-intercept diagonal, score-norm
    * stop), separately implemented — partial pivoting here vs the
    * engine's in-place solve, row-order sums vs partition combines. */
  private def driverIrls(x: Array[Array[Double]], y: Array[Double],
                         maxIters: Int, tol: Double,
                         ridge: Double): Array[Double] = {
    val n = x.length
    val p1 = x.head.length // includes intercept column
    var beta = new Array[Double](p1)
    var it = 0
    var grad = Double.MaxValue
    while (it < maxIters && grad > tol) {
      val eta = x.map(r => r.indices.map(i => r(i) * beta(i)).sum)
      val prob = eta.map(e => 1.0 / (1.0 + math.exp(-e)))
      val wgt = prob.map(pr => math.max(pr * (1.0 - pr), 1e-6))
      val u = (0 until n).map(k => eta(k) + (y(k) - prob(k)) / wgt(k))
      grad = (0 until p1).map(i =>
        math.abs((0 until n).map(k => x(k)(i) * (y(k) - prob(k))).sum)).max / n
      if (grad > tol) {
        val a = Array.ofDim[Double](p1, p1)
        val b = new Array[Double](p1)
        for (k <- 0 until n; i <- 0 until p1) {
          b(i) += wgt(k) * x(k)(i) * u(k)
          for (j <- 0 until p1) a(i)(j) += wgt(k) * x(k)(i) * x(k)(j)
        }
        for (i <- 1 until p1) a(i)(i) += ridge * n
        // Gaussian elimination WITH partial pivoting (deliberately not
        // the engine's pivot-free solve — an independent path)
        for (c <- 0 until p1) {
          val piv = (c until p1).maxBy(r => math.abs(a(r)(c)))
          val tmp = a(c); a(c) = a(piv); a(piv) = tmp
          val tb = b(c); b(c) = b(piv); b(piv) = tb
          for (r <- c + 1 until p1) {
            val f = a(r)(c) / a(c)(c)
            for (cc <- c until p1) a(r)(cc) -= f * a(c)(cc)
            b(r) -= f * b(c)
          }
        }
        val nb = new Array[Double](p1)
        for (c <- p1 - 1 to 0 by -1) {
          var s = b(c)
          for (cc <- c + 1 until p1) s -= a(c)(cc) * nb(cc)
          nb(c) = s / a(c)(c)
        }
        beta = nb
        it += 1
      }
    }
    beta
  }

  test("distributed ridge-IRLS fit matches an independent driver refit on the quality design") {
    val docs = Tables.documents(spark, sf)
    val wide = TextAnalysis.hashedBowWide(docs, nBuckets, "r9q", "md5")
    val ntC = (0 until nBuckets).map(i => col(s"b$i")).reduce(_ + _)
      .cast("double")
    val w = wide.withColumn("nt", ntC)
      .withColumn("seedset",
        Sampling.bucket(col("doc_id"), "r9qs", "md5") < lit(500000L))
    val fitSet = w.filter(col("seedset"))
    val st = fitSet.agg(avg(col("nt")).as("m"),
      stddev_pop(col("nt")).as("sd")).head()
    val (mean, sd) = (st.getDouble(0), st.getDouble(1))
    val feats = ((col("nt") - lit(mean)) / lit(sd)) +:
      (0 until nBuckets - 1).map(i => col(s"b$i").cast("double"))
    val rule = col("nt") >= lit(55.0)
    val fit = Features.logisticFit(fitSet, feats, rule,
      maxIters = 25, ridge = 0.03).get

    val rows = fitSet.select((feats :+ rule.cast("int").cast("double")
      .as("__y")).zipWithIndex.map { case (c, i) =>
        if (i < feats.length) c.as(s"f$i") else c }: _*)
      .collect()
    val x = rows.map(r => 1.0 +: feats.indices.map(i => r.getDouble(i)).toArray)
      .map(_.toArray)
    val y = rows.map(_.getDouble(feats.length))
    val ref = driverIrls(x, y, maxIters = 25, tol = 1e-8, ridge = 0.03)

    assert(fit.nFit === rows.length.toLong)
    assert(fit.coef.length === ref.length)
    val scale = ref.map(math.abs).max
    fit.coef.zip(ref).zipWithIndex.foreach { case ((got, want), i) =>
      assert(math.abs(got - want) <= 1e-4 * scale,
        s"coef($i): distributed=$got driver=$want (scale $scale)")
    }
  }

  test("served gate approximates the seed heuristic (>=95% agreement) and probabilities stay open-interval") {
    val docs = Tables.documents(spark, sf)
    val wide = TextAnalysis.hashedBowWide(docs, nBuckets, "r9q", "md5")
    val ntC = (0 until nBuckets).map(i => col(s"b$i")).reduce(_ + _)
      .cast("double")
    val w = wide.withColumn("nt", ntC)
      .withColumn("seedset",
        Sampling.bucket(col("doc_id"), "r9qs", "md5") < lit(500000L))
    val fitSet = w.filter(col("seedset"))
    val st = fitSet.agg(avg(col("nt")).as("m"),
      stddev_pop(col("nt")).as("sd")).head()
    val feats = ((col("nt") - lit(st.getDouble(0))) / lit(st.getDouble(1))) +:
      (0 until nBuckets - 1).map(i => col(s"b$i").cast("double"))
    val rule = col("nt") >= lit(55.0)
    val fit = Features.logisticFit(fitSet, feats, rule,
      maxIters = 25, ridge = 0.03).get
    val served = Features.logisticPredict(w, fit, feats)
    val row = served.agg(
      sum(((col("probability") >= 0.5) === rule).cast("long")).as("agree"),
      count(lit(1)).as("n"),
      min(col("probability")).as("pmin"),
      max(col("probability")).as("pmax")).head()
    assert(row.getLong(0) * 100L >= row.getLong(1) * 95L,
      s"agreement ${row.getLong(0)}/${row.getLong(1)}")
    assert(row.getDouble(2) > 0.0 && row.getDouble(3) < 1.0,
      s"saturated probabilities: [${row.getDouble(2)}, ${row.getDouble(3)}]")
  }
}
