package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** Pins Clustering.kmeansLloyd: hand-checked two-cluster geometry, the
  * tie-to-smaller-cid rule, duplicate-point weighting, and a full
  * differential against an independent driver-side Lloyd implementing
  * the identical arithmetic contract (lexicographic seeding, fixed IEEE
  * distance chain, micro-unit exact means, quantized inertia). */
class ClusteringSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(points: Seq[(Double, Double)], k: Int, iters: Int) =
    Clustering.kmeansLloyd(points.toDF("a", "b"),
      Seq(col("a"), col("b")), k, iters)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap

  /** Independent driver Lloyd with the same determinism contract. */
  private def reference(points: Seq[(Double, Double)], k: Int,
                        iters: Int): Map[Int, (Long, Double, Double, Double)] = {
    def micro(x: Double): Long =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    // weighted distinct tuples
    val pts = points.groupBy(identity).map { case ((a, b), g) =>
      (a, b, micro(a), micro(b), g.size.toLong) }.toSeq
    var cents: Seq[(Int, Double, Double)] = pts.map(p => (p._1, p._2))
      .distinct.sorted.take(k).zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
    def d2(x: (Double, Double), c: (Int, Double, Double)): Double =
      (x._1 - c._2) * (x._1 - c._2) + (x._2 - c._3) * (x._2 - c._3)
    def assign() = pts.map { p =>
      val best = cents.map(c => (d2((p._1, p._2), c), c._1)).min
      (p, best._2, best._1)
    }
    for (_ <- 1 to iters) {
      val byC = assign().groupBy(_._2)
      cents = cents.map { case (cid, ca, cb) =>
        byC.get(cid) match {
          case Some(rows) =>
            val n = rows.map(_._1._5).sum
            val sa = rows.map(r => r._1._3 * r._1._5).sum
            val sb = rows.map(r => r._1._4 * r._1._5).sum
            (cid, sa.toDouble / n.toDouble / 1e6, sb.toDouble / n.toDouble / 1e6)
          case None => (cid, ca, cb) // empty cluster keeps its centroid
        }
      }
    }
    assign().groupBy(_._2).map { case (cid, rows) =>
      val n = rows.map(_._1._5).sum
      val iq = rows.map(r => BigDecimal(r._3 * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong * r._1._5).sum
      val c = cents.find(_._1 == cid).get
      cid -> ((n, c._2, c._3, iq.toDouble / 1e6))
    }
  }

  test("two well-separated blobs resolve to their exact means") {
    val pts = Seq((0.0, 0.0), (0.0, 1.0), (1.0, 0.0),
      (10.0, 10.0), (10.0, 11.0), (11.0, 10.0))
    val out = run(pts, k = 2, iters = 3)
    assert(out(0) === ((3L, 1.0 / 3.0, 1.0 / 3.0, out(0)._4)))
    assert(out(1) === ((3L, 31.0 / 3.0, 31.0 / 3.0, out(1)._4)))
    assert(out === reference(pts, 2, 3))
  }

  test("equidistant point breaks to the smaller cluster id") {
    // lexicographic seeds: (0,0) → cid 0, (0,2) → cid 1; the non-seed
    // point (1,1) has d² = 2 to BOTH → the tie must join cluster 0,
    // pulling c0 to (0.5, 0.5) and leaving c1 a singleton — had the tie
    // gone to cid 1, the final counts would be (1, 2) instead of (2, 1)
    val out = run(Seq((0.0, 0.0), (0.0, 2.0), (1.0, 1.0)), k = 2, iters = 1)
    assert(out(0)._1 === 2L && out(1)._1 === 1L)
    assert(out(0)._2 === 0.5 && out(0)._3 === 0.5)
    assert(out(1)._2 === 0.0 && out(1)._3 === 2.0)
  }

  test("duplicate points weight the mean and the counts") {
    // 4 copies at (0,0) against 1 at (1,0): centroid = 1/5 on x
    val out = run(Seq.fill(4)((0.0, 0.0)) :+ ((1.0, 0.0)), k = 1, iters = 2)
    assert(out(0)._1 === 5L)
    assert(out(0)._2 === 200000L.toDouble / 1e6)
  }

  test("differential vs the driver reference on pseudo-random points, layout-invariant") {
    val pts = (1 to 40).map(i =>
      (((i * 37) % 19).toDouble / 3.0 - 2.0, ((i * i * 11) % 23).toDouble / 5.0))
    val out = run(pts, k = 5, iters = 4)
    assert(out === reference(pts, 5, 4))
    val repart = Clustering.kmeansLloyd(pts.toDF("a", "b").repartition(7),
      Seq(col("a"), col("b")), 5, 4)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(repart === out) // bitwise under any physical layout
  }

  test("guards fail loud") {
    val df = Seq((1.0, 2.0)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Clustering.kmeansLloyd(df, Seq.empty, 2, 2)
    }
    intercept[IllegalArgumentException] {
      Clustering.kmeansLloyd(df, Seq(col("a")), 0, 2)
    }
    intercept[IllegalArgumentException] {
      Clustering.kmeansLloyd(df, Seq(col("a")), 2, 0)
    }
  }
}
