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

  test("stateEpisodesChunked is IDENTICAL to the plain form: runs " +
    "spanning chunk boundaries, multi-chunk runs, null group keys, and " +
    "the real events table") {
    // chunk = i DIV 3: u1's A-run spans chunks 0→1 (merge, not split);
    // u3 holds ONE state across four chunks (adj = 0 chain); null-key
    // group spans chunks (the joinCarry null-safety contract)
    val df = Seq(
      (Option(1L), 1, "A"), (Option(1L), 2, "A"), (Option(1L), 3, "A"),
      (Option(1L), 4, "B"), (Option(1L), 5, "B"), (Option(1L), 6, "A"),
      (Option(2L), 2, "A"), (Option(2L), 4, "B"),
      (Option(3L), 0, "C"), (Option(3L), 3, "C"), (Option(3L), 6, "C"),
      (Option(3L), 9, "C"),
      (Option.empty[Long], 1, "X"), (Option.empty[Long], 4, "X"),
      (Option.empty[Long], 7, "Y")
    ).toDF("u", "i", "st")
    val chunk = expr("CAST(i DIV 3 AS BIGINT)")
    def snap(d: org.apache.spark.sql.DataFrame) =
      d.select(col("u"), col("episode_id"), col("state"), col("n_events"),
        col("first_ord.i"), col("last_ord.i"))
        .collect().map(r => (r.getAs[Any](0), r.getLong(1)) ->
          ((r.getString(2), r.getLong(3), r.getInt(4), r.getInt(5)))).toMap
    val plain = snap(Intervals.stateEpisodes(df, Seq("u"), Seq(col("i")),
      col("st")))
    val chunked = snap(Intervals.stateEpisodesChunked(df, Seq("u"),
      Seq(col("i")), col("st"), chunk))
    assert(chunked === plain)
    // sanity on the intent, not just identity: u3 is ONE episode
    assert(plain((3L, 1L)) === (("C", 4L, 0, 9)))
    // non-monotone chunk fails loud (the chunkGuard contract)
    val e = intercept[Exception] {
      Intervals.stateEpisodesChunked(df, Seq("u"), Seq(col("i")),
        col("st"), expr("CAST(i % 3 AS BIGINT)")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not monotone")), s"got: $e")
    // real events, the registered row's exact shape (month chunks)
    val ev = Tables.events(spark, sf0001)
    val mchunk = expr(
      "floor(unix_micros(CAST(ts AS TIMESTAMP)) / 2592000000000)")
    def rsnap(d: org.apache.spark.sql.DataFrame) =
      d.select(col("user_id"), col("episode_id"), col("state"),
        col("n_events"), col("first_ord.ts"), col("last_ord.ts"))
        .collect().map(r => (r.getAs[Any](0), r.getLong(1)) ->
          ((r.getString(2), r.getLong(3), r.getAs[Any](4), r.getAs[Any](5))))
        .toMap
    val rp = rsnap(Intervals.stateEpisodes(ev, Seq("user_id"),
      Seq(col("ts"), col("event_id")), col("event_type")))
    val rc = rsnap(Intervals.stateEpisodesChunked(ev, Seq("user_id"),
      Seq(col("ts"), col("event_id")), col("event_type"), mchunk))
    assert(rc === rp)
  }

  test("interpolateDailyChunked is IDENTICAL to interpolateDaily on the " +
    "real events table (month chunks) and an on-point/boundary fixture") {
    import graft.operators.Resample
    // fixture: observation exactly ON a spine day (y = y0 exactly),
    // a multi-day gap blending across a chunk boundary, boundary drop
    val df = Seq(
      ("g", 1L, "2024-01-30 00:00:00", 10.0),
      ("g", 2L, "2024-02-02 12:00:00", 40.0), // gap spans the month edge
      ("g", 3L, "2024-02-05 00:00:00", 100.0),
      ("h", 4L, "2024-03-10 06:00:00", 1.0) // single point: no output
    ).toDF("k", "id", "ts_s", "v")
      .withColumn("ts", col("ts_s").cast("timestamp_ntz")).drop("ts_s")
    def snap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getAs[Any](1).toString) ->
        r.getDouble(2)).toMap
    val plain = snap(Resample.interpolateDaily(df, Seq("k"), "ts", "id", "v"))
    val chunked = snap(Resample.interpolateDailyChunked(
      df, Seq("k"), "ts", "id", "v"))
    assert(chunked.keySet === plain.keySet)
    chunked.foreach { case (k, v) => assert(v === plain(k), s"day $k") }
    assert(plain.contains(("g", "2024-01-30 00:00:00.0")) ||
      plain.contains(("g", "2024-01-30T00:00"))) // on-point day emitted
    // real events, the registered row's shape
    val ev = Tables.events(spark, sf0001)
    val rp = snap(Resample.interpolateDaily(
      ev, Seq("event_type"), "ts", "event_id", "value"))
    val rc = snap(Resample.interpolateDailyChunked(
      ev, Seq("event_type"), "ts", "event_id", "value"))
    assert(rc.keySet === rp.keySet)
    rc.foreach { case (k, v) => assert(v === rp(k), s"day $k") } // bit-equal
  }
}
