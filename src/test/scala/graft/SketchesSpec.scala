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
  }

  test("count-min: null keys excluded, estimate of an unseen key stays an overestimate of 0") {
    val df = Seq(Some("x"), None, Some("x")).toDF("k")
    val sk = Sketches.countMin(df, col("k"), 8, 2, "n1")
    assert(sk.agg(sum(col("c"))).head.getLong(0) === 2L * 2) // nulls dropped
    val est = Sketches.cmsEstimate(sk, Seq("zzz").toDF("k"), col("k"),
      8, 2, "n1").head.getLong(1)
    assert(est >= 0L) // never negative; may collide up, never down
  }
}
