package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** AsOfJoin semantics (inclusive nearest, left-outer, tolerance, ties,
  * both directions), a differential against the naive
  * range-join-then-collapse implementation on real data, and the plan
  * contract that justifies the operator: ONE shuffle per side, no
  * nested-loop anywhere. The oracle rows (asof_attribution,
  * asof_next_error) cross-check values against DuckDB's own ASOF JOIN;
  * this spec pins what those can't: edge semantics on crafted rows and
  * the physical plan. */
class AsOfJoinSpec extends SparkSpecBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val build: DataFrame = Seq(
    ("k1", "2024-01-01 09:00:00", "a"),
    ("k1", "2024-01-01 10:00:00", "b"),
    ("k1", "2024-01-01 11:00:00", "c"))
    .toDF("k", "bts", "v")
    .withColumn("bts", to_timestamp(col("bts")))

  private def probes(rows: (String, String)*): DataFrame =
    rows.toSeq.toDF("k", "pts").withColumn("pts", to_timestamp(col("pts")))

  test("backward: nearest at-or-before, inclusive, left-outer on misses") {
    val probe = probes(
      ("k1", "2024-01-01 10:30:00"), // between b and c -> b
      ("k1", "2024-01-01 10:00:00"), // exactly at b -> b (inclusive)
      ("k1", "2024-01-01 08:00:00"), // before all -> NULL
      ("k2", "2024-01-01 12:00:00")) // no builds for key -> NULL
    val got = AsOfJoin.backward(probe, build, Seq("k"), "pts", "bts", Seq("v"))
      .select(col("k"), col("pts"), col("v"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getString(2)))
      .toSet
    assert(got === Set(
      ("k1", ts("2024-01-01 10:30:00"), "b"),
      ("k1", ts("2024-01-01 10:00:00"), "b"),
      ("k1", ts("2024-01-01 08:00:00"), null),
      ("k2", ts("2024-01-01 12:00:00"), null)))
  }

  test("forward: nearest at-or-after, inclusive, left-outer past the end") {
    val probe = probes(
      ("k1", "2024-01-01 10:30:00"), // -> c
      ("k1", "2024-01-01 11:00:00"), // exactly at c -> c (inclusive)
      ("k1", "2024-01-01 12:00:00")) // after all -> NULL
    val got = AsOfJoin.forward(probe, build, Seq("k"), "pts", "bts", Seq("v"))
      .select(col("pts"), col("v"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1))).toSet
    assert(got === Set(
      (ts("2024-01-01 10:30:00"), "c"),
      (ts("2024-01-01 11:00:00"), "c"),
      (ts("2024-01-01 12:00:00"), null)))
  }

  test("tolerance NULLs a match that exists but is too far") {
    val probe = probes(("k1", "2024-01-01 10:30:00"))
    def matchWithTol(tol: String): String =
      AsOfJoin.backward(probe, build, Seq("k"), "pts", "bts", Seq("v"),
          tolerance = Some(expr(s"INTERVAL $tol")))
        .select(col("v")).collect().head.getString(0)
    assert(matchWithTol("40 MINUTES") === "b") // 30 min away, within 40
    assert(matchWithTol("10 MINUTES") === null) // 30 min away, beyond 10
  }

  test("equal-timestamp build ties: greatest tiebreak wins, both directions") {
    val tied = Seq(
      ("k1", "2024-01-01 10:00:00", 1L, "low"),
      ("k1", "2024-01-01 10:00:00", 2L, "high"))
      .toDF("k", "bts", "id", "v")
      .withColumn("bts", to_timestamp(col("bts")))
    val pBack = probes(("k1", "2024-01-01 10:30:00"))
    val pFwd = probes(("k1", "2024-01-01 09:30:00"))
    val back = AsOfJoin.backward(pBack, tied, Seq("k"), "pts", "bts",
      Seq("v"), tiebreak = Some("id")).select(col("v")).collect().head.getString(0)
    val fwd = AsOfJoin.forward(pFwd, tied, Seq("k"), "pts", "bts",
      Seq("v"), tiebreak = Some("id")).select(col("v")).collect().head.getString(0)
    assert(back === "high" && fwd === "high")
  }

  test("differential vs naive range-join-then-collapse on real events") {
    val ev = Tables.events(spark, sf0001)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("ts"), col("user_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("purchase_ts"))
      .agg(max(col("event_id")).as("purchase_id"))

    val asof = AsOfJoin.backward(clicks, purchases, Seq("user_id"),
      "ts", "purchase_ts", Seq("purchase_id"))

    // Naive: materialize ALL (click, earlier purchase) pairs, keep the
    // latest per click — the quadratic plan the operator exists to avoid.
    val pairs = clicks.join(purchases,
      clicks("user_id") === purchases("user_id") &&
        purchases("purchase_ts") <= clicks("ts"), "left")
      .select(clicks("event_id"), clicks("ts"), clicks("user_id"),
        purchases("purchase_ts"), purchases("purchase_id"))
    val naive = pairs.withColumn("rn", row_number().over(
        Window.partitionBy(col("event_id"))
          .orderBy(col("purchase_ts").desc_nulls_last)))
      .where(col("rn") === 1).drop("rn")

    val key = (r: org.apache.spark.sql.Row) => r.toSeq.map(String.valueOf).mkString("|")
    assert(asof.collect().map(key).sorted.toSeq ===
      naive.collect().map(key).sorted.toSeq)
  }

  test("broadcast path == window path on real data, incl. tolerance") {
    val ev = Tables.events(spark, sf0001)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("ts"), col("user_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("purchase_ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    for (tol <- Seq(None, Some(expr("INTERVAL 72 HOURS")))) {
      val window = AsOfJoin.backward(clicks, purchases, Seq("user_id"),
        "ts", "purchase_ts", Seq("purchase_id"), tolerance = tol)
      val bcast = AsOfJoin.broadcastBackward(clicks, purchases, Seq("user_id"),
        "ts", "purchase_ts", Seq("purchase_id"), tolerance = tol)
      assert(canon(bcast) === canon(window), s"diverged at tolerance=$tol")
    }
  }

  test("broadcast FORWARD == window forward on real data, incl. tolerance") {
    val ev = Tables.events(spark, sf0001)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"), col("user_id"))
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("error_ts")).distinct()
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    for (tol <- Seq(None, Some(expr("INTERVAL 48 HOURS")))) {
      val window = AsOfJoin.forward(purchases, errors, Seq("user_id"),
        "ts", "error_ts", Seq.empty, tolerance = tol)
      val bcast = AsOfJoin.broadcastForward(purchases, errors, Seq("user_id"),
        "ts", "error_ts", Seq.empty, tolerance = tol)
      assert(canon(bcast) === canon(window), s"diverged at tolerance=$tol")
    }
  }

  test("broadcast forward: ties take the greatest tiebreak; nulls never match") {
    val tied = Seq(
      ("k1", "2024-01-01 11:00:00", 1L, "low"),
      ("k1", "2024-01-01 11:00:00", 2L, "high"),
      ("k1", "2024-01-01 12:00:00", 3L, "later"),
      ("k1", null, 4L, "nullts"))
      .toDF("k", "bts", "id", "v")
      .withColumn("bts", to_timestamp(col("bts")))
    val probe = Seq(("k1", "2024-01-01 10:30:00"), ("k1", null),
        ("k1", "2024-01-01 11:30:00"))
      .toDF("k", "pts").withColumn("pts", to_timestamp(col("pts")))
    val got = AsOfJoin.broadcastForward(probe, tied, Seq("k"), "pts", "bts",
        Seq("v"), tiebreak = Some("id"))
      .select(col("pts"), col("v"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1))).toSet
    assert(got === Set(
      (ts("2024-01-01 10:30:00"), "high"),  // first at-or-after run, greatest id
      (ts("2024-01-01 11:30:00"), "later"), // skips the 11:00 run
      (null, null)))                        // null probe ts never matches
  }

  test("broadcast path: equal-ts ties and null timestamps match the window path") {
    val tied = Seq(
      ("k1", "2024-01-01 10:00:00", 1L, "low"),
      ("k1", "2024-01-01 10:00:00", 2L, "high"),
      ("k1", null, 3L, "nullts"))
      .toDF("k", "bts", "id", "v")
      .withColumn("bts", to_timestamp(col("bts")))
    val probe = Seq(("k1", "2024-01-01 10:30:00"), ("k1", null))
      .toDF("k", "pts").withColumn("pts", to_timestamp(col("pts")))
    val got = AsOfJoin.broadcastBackward(probe, tied, Seq("k"), "pts", "bts",
        Seq("v"), tiebreak = Some("id"))
      .select(col("pts"), col("v"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1))).toSet
    assert(got === Set(
      (ts("2024-01-01 10:30:00"), "high"), // greatest tiebreak, not nullts
      (null, null)))                       // null probe ts never matches
  }

  test("streaming enrichment: as-of against a cached pack on an unbounded probe side") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    // static reference series (the exchange-rate shape), packed ONCE
    val rates = Seq(
      ("EUR", "2024-01-01 00:00:00", 1.09),
      ("EUR", "2024-01-02 00:00:00", 1.10),
      ("JPY", "2024-01-01 00:00:00", 0.0070))
      .toDF("ccy", "rts", "rate").withColumn("rts", to_timestamp(col("rts")))
    val packed = AsOfJoin.pack(rates, Seq("ccy"), "rts", Seq("rate")).cache()
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val stream = in.toDF().toDF("event_id", "ccy", "ets")
    val q = AsOfJoin.backwardAgainst(stream, packed, "ets")
      .writeStream.format("memory").queryName("asof_enrich")
      .outputMode("append").start()
    try {
      in.addData((1L, "EUR", ts("2024-01-01 12:00:00")),
        (2L, "JPY", ts("2024-01-05 00:00:00")))
      q.processAllAvailable()
      in.addData((3L, "EUR", ts("2024-01-03 00:00:00")), // sees the 01-02 rate
        (4L, "GBP", ts("2024-01-03 00:00:00")))          // no series -> NULL
      q.processAllAvailable()
      val got = spark.table("asof_enrich")
        .select(col("event_id"), col("rate")).collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(got === Map(1L -> Some(1.09), 2L -> Some(0.0070),
        3L -> Some(1.10), 4L -> None))
    } finally { q.stop(); packed.unpersist() }
  }

  test("null KEYS never match, identically on both implementations") {
    val b = Seq((Option("k1"), "2024-01-01 09:00:00", "a"),
        (Option.empty[String], "2024-01-01 09:00:00", "nullkey"))
      .toDF("k", "bts", "v").withColumn("bts", to_timestamp(col("bts")))
    val p = Seq((Option("k1"), "2024-01-01 10:00:00"),
        (Option.empty[String], "2024-01-01 10:00:00"))
      .toDF("k", "pts").withColumn("pts", to_timestamp(col("pts")))
    def got(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("v")).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    val expected = Set(("k1", "a"), (null, null)) // null-key probe kept, unmatched
    assert(got(AsOfJoin.backward(p, b, Seq("k"), "pts", "bts", Seq("v")))
      === expected)
    assert(got(AsOfJoin.broadcastBackward(p, b, Seq("k"), "pts", "bts", Seq("v")))
      === expected)
    assert(got(AsOfJoin.forward(p, b, Seq("k"), "pts", "bts", Seq("v")))
      === Set(("k1", null), (null, null))) // no k1 build at/after 10:00
  }

  test("broadcast plan: probe side map-only — no window sort, build agg only exchange") {
    val ev = Tables.events(spark, sf0001)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("ts"), col("user_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    // both directions share the implementation — pin the plan for both
    for (dir <- Seq("backward", "forward")) {
      val q =
        if (dir == "backward")
          AsOfJoin.broadcastBackward(clicks, purchases, Seq("user_id"),
            "ts", "purchase_ts", Seq("purchase_id"),
            tiebreak = Some("purchase_id"))
        else
          AsOfJoin.broadcastForward(clicks, purchases, Seq("user_id"),
            "ts", "purchase_ts", Seq("purchase_id"),
            tiebreak = Some("purchase_id"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("BroadcastHashJoin"),
        s"[$dir] expected broadcast join:\n$plan")
      assert(!plan.contains("Window") && !plan.contains("SortMergeJoin"),
        s"[$dir] probe side must stay map-only:\n$plan")
      // the only hash exchange is the BUILD side's groupBy — the probe
      // (fact) side reaches the join straight from its scan
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges === 1, s"[$dir] expected one (build-side) exchange:\n$plan")
    }
  }

  test("auto: size gate picks broadcast under the budget, window merge above — equal results") {
    val ev = Tables.events(spark, sf0001)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("ts"), col("user_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val viaBcast = AsOfJoin.autoBackward(clicks, purchases, Seq("user_id"),
      "ts", "purchase_ts", Seq("purchase_id"),
      tiebreak = Some("purchase_id")) // default 64 MB budget — fits
    val viaWindow = AsOfJoin.autoBackward(clicks, purchases, Seq("user_id"),
      "ts", "purchase_ts", Seq("purchase_id"),
      tiebreak = Some("purchase_id"),
      maxBuildBytes = 1L) // nothing fits — MUST fall back
    assert(canon(viaBcast) === canon(viaWindow))
    viaBcast.collect(); viaWindow.collect()
    def plan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the gate picked structurally different plans: pack+probe broadcasts,
    // the fallback runs the union→window merge (no broadcast-able pack)
    assert(plan(viaBcast).contains("BroadcastHashJoin") &&
      !plan(viaBcast).contains("Window"))
    assert(plan(viaWindow).contains("Window") &&
      !plan(viaWindow).contains("BroadcastHashJoin"))
    // and the estimate itself is sane: positive, and monotone in payload
    val est = AsOfJoin.packSizeEstimate(purchases, Seq("user_id"),
      "purchase_ts", Seq("purchase_id"), None)
    assert(est > 0 && est <= BigInt(64L << 20))
  }

  test("hot-key pre-split: 90%-one-key probe — equal to unsalted, hot key spread, cold keys untouched") {
    val hotRows = (0 until 900).map(i =>
      ("hot", f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"))
    val coldRows = (0 until 100).map(i =>
      (s"cold${i % 20}", f"2024-01-01 03:${i % 60}%02d:00"))
    val probe = (hotRows ++ coldRows).toDF("k", "pts")
      .withColumn("pts", to_timestamp(col("pts")))
    val builds = Seq(
      ("hot", "2024-01-01 02:00:00", "h1"), ("hot", "2024-01-01 10:00:00", "h2"),
      ("cold0", "2024-01-01 01:00:00", "c1"), ("cold1", "2024-01-01 05:00:00", "c2"))
      .toDF("k", "bts", "bv").withColumn("bts", to_timestamp(col("bts")))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val plain = AsOfJoin.backward(probe, builds, Seq("k"), "pts", "bts", Seq("bv"))
    val split = AsOfJoin.backwardPreSplit(probe, builds, Seq("k"), "pts", "bts",
      Seq("bv"), rowBudget = 100, saltBuckets = 8)
    assert(canon(split) === canon(plain)) // row-for-row the unsalted answer
    // the spread contract: no single (key, salt) partition holds the hot
    // key whole — that group is exactly what one window task sorts
    val (l, r) = AsOfJoin.preSplit(probe, builds, Seq("k"), "pts",
      rowBudget = 100, saltBuckets = 8, sampleFraction = 1.0)
    val hotBuckets = l.filter(col("k") === "hot")
      .groupBy(col("__asof_salt")).count()
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap
    assert(hotBuckets.size >= 4, s"hot key not spread: $hotBuckets")
    assert(hotBuckets.values.max < 900L, s"one bucket holds the hot key: $hotBuckets")
    assert(hotBuckets.values.sum === 900L)
    // cold keys ride bucket 0 unsalted, and their builds are NOT replicated
    val coldSalts = l.filter(col("k") =!= "hot")
      .select(col("__asof_salt")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(coldSalts === Set(0L))
    assert(r.filter(col("k") === "hot").count() === 2L * 8)  // replicated
    assert(r.filter(col("k") =!= "hot").count() === 2L)      // not replicated
  }

  test("hot-key pre-split: a hot NULL probe key is detected (null-safe probe) and salted, output unchanged") {
    // 900 null-key probe rows: groupBy counts NULL as a group and the
    // window merge partitions NULLs together, so before the null-safe
    // probe these all serialized into one task at salt 0.
    val hotNull = (0 until 900).map(i =>
      (null: String, f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"))
    val cold = (0 until 50).map(i =>
      (s"c${i % 10}", f"2024-01-01 03:${i % 60}%02d:00"))
    val probe = (hotNull ++ cold).toDF("k", "pts")
      .withColumn("pts", to_timestamp(col("pts")))
    val builds = Seq(("c0", "2024-01-01 01:00:00", "b1"),
      (null: String, "2024-01-01 01:30:00", "bn"))
      .toDF("k", "bts", "bv").withColumn("bts", to_timestamp(col("bts")))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val plain = AsOfJoin.backward(probe, builds, Seq("k"), "pts", "bts", Seq("bv"))
    val split = AsOfJoin.backwardPreSplit(probe, builds, Seq("k"), "pts", "bts",
      Seq("bv"), rowBudget = 100, saltBuckets = 8)
    // null keys still never match — salting them is output-invisible
    assert(canon(split) === canon(plain))
    val (l, _) = AsOfJoin.preSplit(probe, builds, Seq("k"), "pts",
      rowBudget = 100, saltBuckets = 8, sampleFraction = 1.0)
    val nullSalts = l.filter(col("k").isNull)
      .select(col("__asof_salt")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(nullSalts.size >= 4, s"hot NULL key not spread: $nullSalts")
    // cold keys still unsalted
    assert(l.filter(col("k").isNotNull).select(col("__asof_salt"))
      .distinct().collect().map(_.getLong(0)).toSet === Set(0L))
  }

  test("plan: one hash exchange per side's union, no nested loop") {
    val ev = Tables.events(spark, sf0001)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("ts"), col("user_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    val q = AsOfJoin.backward(clicks, purchases, Seq("user_id"),
      "ts", "purchase_ts", Seq("purchase_id"), tiebreak = Some("purchase_id"))
    q.collect() // let AQE finalize
    // the AQE string repeats the plan under "== Initial Plan ==" — count
    // exchanges in the final section only
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected ONE exchange (union -> window):\n$plan")
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"as-of must never nested-loop:\n$plan")
  }
}
