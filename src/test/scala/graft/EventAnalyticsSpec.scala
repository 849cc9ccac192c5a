package graft

import java.sql.Timestamp

import graft.operators.EventAnalytics

/** Pins the event-analytics semantics the sf0.01 differential can't
  * isolate: strict in-order funnel progression (a later stage's event
  * BEFORE the prior stage's first completion must not count), same-ts
  * tie-breaking by event_id, retention offsets, and the journey step cap. */
class EventAnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(day: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d 00:00:${sec}%02d")

  // user 1: signup → view → purchase (reaches 1,2, skips click → stops at 2)
  // user 2: view BEFORE signup, then signup only → view must not count
  // user 3: full in-order funnel
  // user 4: click/purchase only → reaches nothing (no signup)
  private val events = Seq(
    (1L, ts(1), 1L, "signup"), (2L, ts(2), 1L, "view"), (3L, ts(3), 1L, "purchase"),
    (4L, ts(1), 2L, "view"), (5L, ts(2), 2L, "signup"),
    (6L, ts(5), 3L, "signup"), (7L, ts(6), 3L, "view"),
    (8L, ts(7), 3L, "click"), (9L, ts(8), 3L, "purchase"),
    (10L, ts(1), 4L, "click"), (11L, ts(2), 4L, "purchase")
  ).toDF("event_id", "ts", "user_id", "event_type")

  private val stages = Seq("signup", "view", "click", "purchase")

  test("funnel: stages only count when reached strictly in order") {
    val out = EventAnalytics.funnel(events, stages)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out === Map(1 -> 3L, 2 -> 2L, 3 -> 1L, 4 -> 1L))
  }

  test("funnel: same-timestamp progression is broken by event_id, strictly") {
    val sameTs = Seq(
      (1L, ts(1), 1L, "signup"), (2L, ts(1), 1L, "view"), // id 2 > id 1 → counts
      (4L, ts(1), 2L, "view"), (5L, ts(1), 2L, "signup") // view id < signup id → no
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.funnel(sameTs, Seq("signup", "view"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out === Map(1 -> 2L, 2 -> 1L))
  }

  test("retention: cohort is the first-event week; offsets count whole weeks") {
    // 2024-01-01 is a Monday. user 1 first active week 0, again weeks 0 and 2;
    // user 2 first active in week 2 only.
    val ev = Seq(
      (1L, ts(1), 1L, "view"), (2L, ts(3), 1L, "view"), (3L, ts(15), 1L, "view"),
      (4L, ts(16), 2L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.retentionCohorts(ev, "week")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("2024-01-01", 0) -> 1L, ("2024-01-01", 2) -> 1L, ("2024-01-15", 0) -> 1L))
  }

  test("journeys: capped at maxSteps in (ts, event_id) order") {
    val out = EventAnalytics.journeys(events, maxSteps = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map(
      "signup>view" -> 2L, // users 1 and 3 (truncated at 2 steps)
      "view>signup" -> 1L, // user 2
      "click>purchase" -> 1L)) // user 4
  }

  test("markov: MLE transition counts, no cross-user pairing, deterministic ranking") {
    // user 1: A,B,A,B  → A>B ×2, B>A ×1 ; user 2: A,C → A>C ×1
    // user 1 ends with B and user 2 starts with A: B>A must NOT gain a
    // cross-user transition (the window partitions by user)
    val ev = Seq(
      (1L, ts(1), 1L, "A"), (2L, ts(2), 1L, "B"),
      (3L, ts(3), 1L, "A"), (4L, ts(4), 1L, "B"),
      (5L, ts(1), 2L, "A"), (6L, ts(2), 2L, "C")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.markovTransitions(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5)))).toMap
    assert(out === Map(
      ("A", "B") -> ((2L, 3L, 2.0 / 3.0, 1)),
      ("A", "C") -> ((1L, 3L, 1.0 / 3.0, 2)),
      ("B", "A") -> ((1L, 1L, 1.0, 1))))
  }

  test("funnelReaches: per-user greedy reach times match the counted funnel") {
    val out = EventAnalytics.funnelReaches(events, stages)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        r.getTimestamp(3)).toMap
    // user 1 reaches signup@d1 then view@d2, stops before click
    assert(out((1L, 1)) === ts(1) && out((1L, 2)) === ts(2))
    assert(!out.contains((1L, 3)))
    // user 2's pre-signup view never counts as a reach
    assert(out((2L, 1)) === ts(2) && !out.contains((2L, 2)))
    // user 3 completes all four stages in order
    assert((1 to 4).map(k => out((3L, k))) === Seq(ts(5), ts(6), ts(7), ts(8)))
    // per-stage reach counts equal the counted funnel exactly
    val counts = out.keySet.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val funnel = EventAnalytics.funnel(events, stages)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(counts === funnel.filter(_._2 > 0))
  }

  test("funnelWindowed: conversion window bounds each step; greedy-from-first never retries") {
    val ev = Seq(
      // user 1: view 1 day after signup → converts under a 2-day window
      (1L, ts(1), 1L, "signup"), (2L, ts(2), 1L, "view"),
      // user 2: view 4 days after signup → outside the window
      (3L, ts(1), 2L, "signup"), (4L, ts(5), 2L, "view"),
      // user 3: first signup d1, second d4, view d5 — within 2 days of
      // the SECOND signup only; greedy-from-first anchors at d1 → no
      (5L, ts(1), 3L, "signup"), (6L, ts(4), 3L, "signup"),
      (7L, ts(5), 3L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val windowed = EventAnalytics.funnelWindowed(ev, Seq("signup", "view"),
      maxGapDays = Some(2))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(windowed === Map(1 -> 3L, 2 -> 1L))
    // the unbounded funnel converts all three — the window is what bites
    val unbounded = EventAnalytics.funnel(ev, Seq("signup", "view"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(unbounded === Map(1 -> 3L, 2 -> 3L))
    intercept[IllegalArgumentException] {
      EventAnalytics.funnelWindowed(ev, Seq("signup"), Some(0))
    }
  }

  test("markov: equal counts rank by destination name — a total order") {
    val ev = Seq(
      (1L, ts(1), 1L, "A"), (2L, ts(2), 1L, "Z"),
      (3L, ts(1), 2L, "A"), (4L, ts(2), 2L, "B")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.markovTransitions(ev)
      .collect().map(r => r.getString(1) -> r.getInt(5)).toMap
    assert(out === Map("B" -> 1, "Z" -> 2)) // n ties at 1 → dst ASC
  }
}
