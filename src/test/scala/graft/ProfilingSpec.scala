package graft

import org.apache.spark.sql.functions._

import graft.operators.Profiling

/** Pins the column-profile semantics the oracle row exercises only on
  * clean data: null accounting (nulls excluded from ndv/min/max), and
  * the loud missing-column guard. */
class ProfilingSpec extends SparkSpecBase {
  import spark.implicits._

  test("nulls counted apart; ndv and min/max ignore them; guard is loud") {
    val df = Seq(
      (Some(3L), Some("b")), (None, Some("a")), (Some(3L), None),
      (Some(7L), Some("a"))
    ).toDF("x", "s")
    val out = Profiling.columnProfile(df, Seq("x", "s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(out("x") === ((4L, 1L, 2L, "3", "7")))
    assert(out("s") === ((4L, 1L, 2L, "a", "b")))
    assertThrows[IllegalArgumentException] {
      Profiling.columnProfile(df, Seq("x", "nope"))
    }
  }

  test("corrMatrix: perfect/anti/zero correlation, pairwise deletion, constant-column NULL") {
    val df = Seq(
      (1.0, 2.0, -1.0, 5.0, Some(1.0)),
      (2.0, 4.0, -2.0, 5.0, Some(4.0)),
      (3.0, 6.0, -3.0, 5.0, None),
      (4.0, 8.0, -4.0, 5.0, Some(2.0))
    ).toDF("a", "b", "neg", "const", "holey")
    val out = Profiling.corrMatrix(df, Seq("a", "b", "neg", "const", "holey"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.getAs[java.lang.Double]("corr"))
          .map(_.toDouble)))).toMap
    assert(out.size === 10) // 5 choose 2
    assert(math.abs(out(("a", "b"))._2.get - 1.0) < 1e-9)   // y = 2x
    assert(math.abs(out(("a", "neg"))._2.get + 1.0) < 1e-9) // y = -x
    assert(out(("a", "const"))._2 === None) // zero variance -> NULL
    // pairwise deletion: (a, holey) uses only the 3 complete rows
    assert(out(("a", "holey"))._1 === 3L)
    assert(out(("a", "b"))._1 === 4L)
    assertThrows[IllegalArgumentException] {
      Profiling.corrMatrix(df, Seq("a"))
    }
    assertThrows[IllegalArgumentException] {
      Profiling.corrMatrix(df, Seq("a", "nope"))
    }
  }

  test("chiSquareIndependence: hand-computed 2x2, empty cells counted, independence reads not-significant") {
    // contingency: r=a: (t=30, c=10); r=b: (t=10, c=30)
    val dep = (Seq.fill(30)(("a", "t")) ++ Seq.fill(10)(("a", "c")) ++
      Seq.fill(10)(("b", "t")) ++ Seq.fill(30)(("b", "c")))
      .toDF("r", "c")
    val out = Profiling.chiSquareIndependence(dep, col("r"), col("c"),
      critical = 3.841).head
    // e = 20 everywhere; chi2 = 4 * (10^2/20) = 20
    assert(math.abs(out.getAs[Double]("chi2") - 20.0) < 1e-9)
    assert(out.getAs[Long]("dof") === 1L)
    assert(out.getAs[Long]("n") === 80L)
    assert(out.getAs[Boolean]("significant"))
    // perfectly balanced -> chi2 = 0, not significant
    val indep = (Seq.fill(20)(("a", "t")) ++ Seq.fill(20)(("a", "c")) ++
      Seq.fill(20)(("b", "t")) ++ Seq.fill(20)(("b", "c"))).toDF("r", "c")
    val o2 = Profiling.chiSquareIndependence(indep, col("r"), col("c"), 3.841)
      .head
    assert(o2.getAs[Double]("chi2") === 0.0)
    assert(!o2.getAs[Boolean]("significant"))
    // an (r,c) combo with ZERO observations still contributes e:
    // r=z only ever appears with c=t; the (z,c) cell is absent from the
    // data but must enter the statistic
    val zero = (Seq.fill(10)(("a", "t")) ++ Seq.fill(10)(("a", "c")) ++
      Seq.fill(10)(("z", "t"))).toDF("r", "c")
    val o3 = Profiling.chiSquareIndependence(zero, col("r"), col("c"), 3.841)
      .head
    // grid: a:(10,10), z:(10,0); n=30, rt(a)=20, rt(z)=10, ct(t)=20, ct(c)=10
    // e(a,t)=40/3, e(a,c)=20/3, e(z,t)=20/3, e(z,c)=10/3
    // chi2 = (10-40/3)^2/(40/3) + (10-20/3)^2/(20/3)*2 + (0-10/3)^2/(10/3)
    val expect = math.pow(10 - 40.0 / 3, 2) / (40.0 / 3) +
      2 * math.pow(10 - 20.0 / 3, 2) / (20.0 / 3) +
      math.pow(10.0 / 3, 2) / (10.0 / 3)
    // 1e-9 quantization grain -> up to 0.5e-9 rounding per cell
    assert(math.abs(o3.getAs[Double]("chi2") - expect) < 1e-6)
  }

  test("anovaF: hand-computed two-group F, constant groups give NULL F, null/abs guards") {
    // groups: a = {1,2,3} (mean 2), b = {5,6,7} (mean 6); grand mean 4
    // SSB = 3*(2-4)^2 + 3*(6-4)^2 = 24; SSW = 2 + 2 = 4
    // F = (24/1) / (4/4) = 24, df1=1, df2=4
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 6.0), ("b", 7.0)
    ).toDF("g", "v")
    val out = Profiling.anovaF(df, col("g"), col("v"), critical = 7.71).head
    assert(out.getAs[Long]("n") === 6L)
    assert(out.getAs[Long]("df1") === 1L)
    assert(out.getAs[Long]("df2") === 4L)
    assert(math.abs(out.getAs[Double]("f") - 24.0) < 1e-6)
    assert(out.getAs[Boolean]("significant")) // 24 > 7.71
    // zero within-variance -> NULL F, NULL verdict
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 9.0), ("b", 9.0))
      .toDF("g", "v")
    val oc = Profiling.anovaF(const, col("g"), col("v"), 7.71).head
    assert(oc.isNullAt(oc.fieldIndex("f")))
    // null group/value rows are excluded before counting
    val dirty = df.unionByName(Seq((null.asInstanceOf[String], 1.0))
      .toDF("g", "v"))
    assert(Profiling.anovaF(dirty, col("g"), col("v"), 7.71)
      .head.getAs[Long]("n") === 6L)
  }

  test("benfordTest: leading digit in exact cents, full 9-cell grid, driver-exact chi2, exclusions") {
    import spark.implicits._
    // digits: 1.00→1, 1.50→1, 2.00→2, 30.00→3, 0.95→9, 0.05→5
    // excluded: zero, negative, null, and 0.004 (rounds to 0 cents)
    val df = Seq(Some(1.0), Some(1.5), Some(2.0), Some(30.0), Some(0.95),
      Some(0.05), Some(0.0), Some(-3.0), None, Some(0.004)).toDF("v")
    val critical = 15.507313055865453
    val out = Profiling.benfordTest(df, col("v"), critical)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(out.keySet === (1L to 9L).toSet) // absent digits still present
    val obs = Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 9L -> 1L)
      .withDefaultValue(0L)
    // independent driver re-derivation of the quantized statistic
    val n = 6.0
    val chi2 = Profiling.benfordProbs.map { case (d, p) =>
      val e = n * p
      val o = obs(d.toLong).toDouble
      math.round((o - e) * (o - e) / e * 1e9)
    }.sum.toDouble / 1e9
    (1L to 9L).foreach { d =>
      val (o, p, c, sig) = out(d)
      assert(o === obs(d))
      assert(p === math.log10(1.0 + 1.0 / d))
      assert(c === chi2)
      assert(sig === (chi2 > critical))
    }
  }

  test("driftTvd: disjoint halves hit TVD 1, identical halves 0, constant and singleton groups degrade") {
    import spark.implicits._
    val df = Seq(
      // g: first half all 0, second half all 9 → total separation
      ("g", 1, 0.0), ("g", 2, 0.0), ("g", 3, 0.0), ("g", 4, 0.0),
      ("g", 5, 9.0), ("g", 6, 9.0), ("g", 7, 9.0), ("g", 8, 9.0),
      // h: identical halves {1,2} vs {1,2}
      ("h", 1, 1.0), ("h", 2, 2.0), ("h", 3, 1.0), ("h", 4, 2.0),
      // c: constant series — degenerate grid must not NaN
      ("c", 1, 5.0), ("c", 2, 5.0),
      // s: singleton — dropped
      ("s", 1, 3.0)
    ).toDF("k", "i", "v")
    val out = Profiling.driftTvd(df, Seq("k"), col("v"), Seq(col("i")),
      nBins = 10, thresholdMilli = 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(out("g") === ((4L, 4L, 1.0, true)))
    assert(out("h") === ((2L, 2L, 0.0, false)))
    assert(out("c") === ((1L, 1L, 0.0, false)))
    assert(!out.contains("s"))
    // null values drop before the split
    val withNull = df.unionByName(
      Seq(("h", 5, Option.empty[Double])).toDF("k", "i", "v"))
    assert(Profiling.driftTvd(withNull, Seq("k"), col("v"), Seq(col("i")),
      10, 100L).collect().length === 3)
  }

  test("giniImpurity: exact integer impurity — pure, uniform, mixed, nulls excluded") {
    import spark.implicits._
    val df = Seq(
      ("u1", "A"), ("u1", "A"), ("u1", "B"), // (9−5)/9 = 4/9
      ("u2", "A"), ("u2", "A"), // pure → 0
      ("u3", "A"), ("u3", "B"), // uniform 2 → 1/2
      ("u3", null.asInstanceOf[String])
    ).toDF("u", "c")
    val out = Profiling.giniImpurity(df, Seq("u"), col("c"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("u1") === ((3L, 2L, 4.0 / 9.0)))
    assert(out("u2") === ((2L, 1L, 0.0)))
    assert(out("u3") === ((2L, 2L, 0.5)))
  }
}
