package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Pins the count-min sketch contract: bounded size, one-sided error
  * (estimates never under-count), cell-wise mergeability, and that small
  * widths really do collide (the property the error bound is about). */
class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  test("count-min: bounded cells, one-sided error, collisions overestimate but never undercount") {
    val e = Tables.events(spark, sf0001)
    val (w, d) = (16, 4)
    val sk = Sketches.countMin(e, col("user_id"), w, d, "s1")
    assert(sk.count() <= w.toLong * d) // fixed-size whatever the corpus
    val est = Sketches.cmsEstimate(sk, e, col("user_id"), w, d, "s1")
    val joined = est.join(
      e.groupBy(col("user_id").as("key")).agg(count(lit(1)).as("t")), "key")
      .select(col("est"), col("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(joined.nonEmpty)
    joined.foreach { case (estN, t) =>
      assert(estN >= t, s"undercount: est $estN < true $t")
    }
    // width 16 over this key spread MUST collide somewhere — otherwise
    // the test proves nothing about the one-sided bound
    assert(joined.exists { case (estN, t) => estN > t },
      "no collisions at width 16 — widen the assertion's reach")
  }

  test("count-min: sketches merge cell-wise (sketch(A∪B) = sketch(A) + sketch(B))") {
    val a = Seq("x", "y", "x", "z").toDF("k")
    val b = Seq("y", "y", "w").toDF("k")
    val (w, d) = (8, 3)
    def cellsOf(df: org.apache.spark.sql.DataFrame) =
      Sketches.countMin(df, col("k"), w, d, "m1")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (cellsOf(a).toSeq ++ cellsOf(b).toSeq)
      .groupMapReduce(_._1)(_._2)(_ + _)
    assert(merged === cellsOf(a.unionByName(b)))
    // and the API form (round 15) equals the hand-written merge
    val apiMerged = Sketches.mergeCountMin(Seq(
        Sketches.countMin(a, col("k"), w, d, "m1"),
        Sketches.countMin(b, col("k"), w, d, "m1")))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(apiMerged === merged)
  }

  test("count-min: null keys excluded, estimate of an unseen key stays an overestimate of 0") {
    val df = Seq(Some("x"), None, Some("x")).toDF("k")
    val sk = Sketches.countMin(df, col("k"), 8, 2, "n1")
    assert(sk.agg(sum(col("c"))).head.getLong(0) === 2L * 2) // nulls dropped
    val est = Sketches.cmsEstimate(sk, Seq("zzz").toDF("k"), col("k"),
      8, 2, "n1").head.getLong(1)
    assert(est >= 0L) // never negative; may collide up, never down
  }

  test("binned histogram: shared-grid shards merge EXACTLY to the direct build; quantiles follow the rank rule") {
    import spark.implicits._
    // 1..100 in one group: lo=1, hi=100, 10 bins of width 9.9
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("k", "v")
    val g = Seq("k")
    val bounds = Sketches.histBounds(df, g, col("v"), nBins = 10)
    val s1 = Sketches.binHistogramWith(
      df.filter(col("v") <= 37.0), bounds, g, col("v"), 10)
    val s2 = Sketches.binHistogramWith(
      df.filter(col("v") > 37.0), bounds, g, col("v"), 10)
    val merged = Sketches.mergeHistograms(Seq(s1, s2), g)
    def cells(h: org.apache.spark.sql.DataFrame) = h
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("cnt")).toMap
    assert(cells(merged) === cells(Sketches.binHistogram(df, g, col("v"), 10)))
    assert(cells(merged).values.sum === 100L)
    // quantiles: p=0.5 -> rank 50; value 50 lands in bin
    // floor((50-1)/9.9)=4, cum through bin 4 = 50 >= 50, so
    // p50 = 1 + 5*9.9 = 50.5; p=1.0 -> last bin right edge = 100
    val q = Sketches.histQuantiles(merged, g, Seq(0.5, 1.0)).head
    assert(math.abs(q.getAs[Double]("q_0") - 50.5) < 1e-9)
    assert(math.abs(q.getAs[Double]("q_1") - 100.0) < 1e-9)
    assert(q.getAs[Long]("n") === 100L)
    // constant group: width degrades to 1.0, everything in bin 0,
    // quantile = lo + 1 (right edge of the single occupied bin)
    val const = Seq(("c", 5.0), ("c", 5.0)).toDF("k", "v")
    val qc = Sketches.histQuantiles(
      Sketches.binHistogram(const, g, col("v"), 10), g, Seq(0.5)).head
    assert(qc.getAs[Double]("q_0") === 6.0)
    // out-of-grid values clamp to the edge bins rather than vanishing
    val late = Sketches.binHistogramWith(
      Seq(("g", -50.0), ("g", 1e6)).toDF("k", "v"), bounds, g, col("v"), 10)
      .collect().map(r => r.getAs[Long]("bin")).sorted
    assert(late.toSeq === Seq(0L, 9L))
    intercept[IllegalArgumentException] {
      Sketches.histQuantiles(merged, g, Seq(0.0))
    }
    intercept[IllegalArgumentException] {
      Sketches.binHistogram(df, g, col("v"), nBins = 1)
    }
  }

  test("bloom: no false negatives ever; tight widths produce real false positives") {
    val keys = (1L to 20L).toDF("k")
    val sk = Sketches.bloom(keys, col("k"), bits = 32, hashes = 3, seed = "b1")
    assert(sk.count() <= 32L) // the sketch can never exceed its bit budget
    // every inserted key answers true — the defining one-sided guarantee
    val in = Sketches.bloomMightContain(sk, keys, col("k"), 32, 3, "b1")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(in.size === 20 && in.values.forall(identity))
    // 100 never-inserted keys against 32 bits: collisions are forced —
    // at least one false positive AND at least one definitive negative
    val out = Sketches.bloomMightContain(
      sk, (1000L to 1099L).toDF("k"), col("k"), 32, 3, "b1")
      .collect().map(r => r.getBoolean(1))
    assert(out.length === 100)
    assert(out.exists(identity), "no false positive at 32 bits — widen the test's reach")
    assert(out.exists(!_), "saturated filter: every probe answered true")
  }

  test("bloom: merge is exact set union, idempotent, and equals the direct sketch") {
    val a = (1L to 30L).toDF("k")
    val b = (20L to 50L).toDF("k")
    def bits(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    val direct = Sketches.bloom(a.union(b), col("k"), 64, 3, "b2")
    val merged = Sketches.mergeBlooms(Seq(
      Sketches.bloom(a, col("k"), 64, 3, "b2"),
      Sketches.bloom(b, col("k"), 64, 3, "b2")))
    assert(bits(merged) === bits(direct)) // OR of shards ≡ sketch of union
    // idempotence by algebra: re-merging a delivered shard is a no-op —
    // the property that lets the streaming maintenance skip the ledger
    val again = Sketches.mergeBlooms(Seq(
      merged, Sketches.bloom(a, col("k"), 64, 3, "b2")))
    assert(bits(again) === bits(direct))
  }

  test("bloom: null keys are excluded and guards fail loud") {
    val df = Seq(Some(1L), None, Some(2L)).toDF("k")
    val sk = Sketches.bloom(df, col("k"), 64, 3, "b3")
    val expected = Sketches.bloom(Seq(1L, 2L).toDF("k"), col("k"), 64, 3, "b3")
    assert(sk.collect().map(_.getLong(0)).toSet ===
      expected.collect().map(_.getLong(0)).toSet)
    intercept[IllegalArgumentException] {
      Sketches.bloom(df, col("k"), bits = 1, hashes = 3, seed = "x")
    }
    intercept[IllegalArgumentException] {
      Sketches.bloomMightContain(sk, df, col("k"), 64, 0, "x")
    }
    intercept[IllegalArgumentException] { Sketches.mergeBlooms(Seq.empty) }
  }
}
