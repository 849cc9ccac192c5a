package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Intervals

/** Pins the gaps-and-islands operators: interval merge (overlap,
  * touching, containment, malformed-input guard) and state episodes
  * (run boundaries, single-row runs, null states, cross-group
  * isolation). */
class IntervalsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")

  test("mergeIntervals: overlap, touching, containment and gaps resolve to hand-checked islands") {
    // g: [1,3] [2,4] (overlap) [4,5] (touching => merges) | [7,8] (gap)
    //    [7:10,7:20] is CONTAINED in [7,8] — same island, end keeps 8
    val df = Seq(
      ("g", ts(1), ts(3)), ("g", ts(2), ts(4)), ("g", ts(4), ts(5)),
      ("g", ts(7), ts(8)), ("g", ts(7, 10), ts(7, 20)),
      ("h", ts(1), ts(2))
    ).toDF("k", "s", "e")
    val out = Intervals.mergeIntervals(df, Seq("k"), col("s"), col("e"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getTimestamp(2), r.getTimestamp(3), r.getLong(4)))).toMap
    assert(out(("g", 1L)) === ((ts(1), ts(5), 3L)))
    assert(out(("g", 2L)) === ((ts(7), ts(8), 2L)))
    assert(out(("h", 1L)) === ((ts(1), ts(2), 1L)))
    assert(out.size === 3)
  }

  test("mergeIntervals: malformed interval fails loud; nulls are excluded") {
    val bad = Seq(("g", ts(3), ts(1))).toDF("k", "s", "e")
    val ex = intercept[Exception] {
      Intervals.mergeIntervals(bad, Seq("k"), col("s"), col("e")).collect()
    }
    assert(ex.getMessage.contains("mergeIntervals")
      || Option(ex.getCause).exists(_.getMessage.contains("mergeIntervals")))
    val withNull = Seq(("g", Some(ts(1)), Some(ts(2))),
      ("g", None, Some(ts(5))), ("g", Some(ts(6)), None))
      .toDF("k", "s", "e")
    assert(Intervals.mergeIntervals(withNull, Seq("k"), col("s"), col("e"))
      .count() === 1L)
  }

  test("stateEpisodes: run boundaries, re-entered states, null exclusion, group isolation") {
    // u1: A A B A  → episodes A(2), B(1), A(1) — A re-entry is a NEW run
    // u2: A        → single episode; u1's trailing A never leaks into u2
    val df = Seq(
      (1L, 1, "A"), (1L, 2, "A"), (1L, 3, "B"), (1L, 4, "A"),
      (1L, 5, null.asInstanceOf[String]),
      (2L, 1, "A")
    ).toDF("u", "i", "st")
    val out = Intervals.stateEpisodes(df, Seq("u"), Seq(col("i")), col("st"))
      .select(col("u"), col("episode_id"), col("state"), col("n_events"),
        col("first_ord.i").as("fi"), col("last_ord.i").as("li"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getInt(4), r.getInt(5)))).toMap
    assert(out((1L, 1L)) === (("A", 2L, 1, 2)))
    assert(out((1L, 2L)) === (("B", 1L, 3, 3)))
    assert(out((1L, 3L)) === (("A", 1L, 4, 4)))
    assert(out((2L, 1L)) === (("A", 1L, 1, 1)))
    assert(out.size === 4) // the null-state row created no episode
  }
}
