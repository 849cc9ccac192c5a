package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver (BENCH_r{N}.json).
  *
  * Methodology (round-1 + round-4 fixes):
  *  - full materialization via the `noop` sink — every column is computed
  *    and every operator (sorts, projections) actually executes; a bare
  *    .count() lets Catalyst prune columns and elide work.
  *  - an untimed warmup action first, so the first measured query doesn't
  *    absorb session/codegen/parquet-reader init (~5 s in round 1).
  *  - construction is OUTSIDE the timed window (round 4): several
  *    registered queries perform real fixture writes while *building*
  *    their DataFrame (SinkQueries' scratch snapshots, the CSV
  *    round-trip). Round 3 timed construction + materialization together
  *    and 12 unrelated queries regressed from the I/O + GC interference.
  *    Now `fn(spark, sfDir)` runs untimed; only the materialization of
  *    the returned plan is measured. EXCEPTION (round 14): `stream_*`
  *    rows are timed END-TO-END (construction + materialization),
  *    because their micro-batch stream executes inside fn() and the
  *    returned frame is just the comparison read-back — see timedMedian.
  *  - median of 3 timed passes per query (round 4): a single pass is
  *    noise-dominated at sub-second scale; the median discards both the
  *    cold first pass and any GC/compaction outlier.
  *  - each pass constructs its OWN DataFrame (fresh `fn` call, untimed):
  *    re-materializing one shared frame would let the dedup queries'
  *    lazily-persisted checkpoints serve passes 2-3 from cache and the
  *    median would hide the sketch stage entirely. Fresh construction
  *    (scratch dirs are nonce-isolated) makes every timed pass compute
  *    the whole plan.
  *  - KNOWN LIMITATION: driver-side actions a query runs while BUILDING
  *    its plan stay untimed — today that is the approx split's
  *    approxQuantile boundary scan, the IVF seeding (a TakeOrdered
  *    sample of O(K) vectors collected for the driver-side farthest-point
  *    pick; ann_ivf_topk's k-means refinement is a lazy checkpoint and IS
  *    timed), and — DELIBERATELY — ann_ivf_persisted's whole index build
  *    + parquet writes: that row measures the SERVE-from-persisted-index
  *    path by design (the build cost is ann_ivf_topk's number). Treat
  *    such actions as statistics/index builds; anything heavier must
  *    live in the returned plan or the number lies.
  *  - failures are reported (time −1, listed in "failed"), never silently
  *    recorded as a fast timing.
  *  - `calib_sec` (round 5): the median timing of a FIXED CPU-bound job
  *    (hash-sum over a constant-size range, no I/O, no data dependence) is
  *    emitted alongside the query timings. The round-4 driver artifact was
  *    3–30× inflated by machine contention and only an out-of-band re-run
  *    could prove it; with a constant-work yardstick in the same JSON any
  *    reader can normalize: query_sec × (expected_calib / calib_sec)
  *    estimates the uncontended timing. Expected range on this box:
  *    ~0.2–0.5 s (see README; tools/bench_compare.py automates the check).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft_warehouse_${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warmup: exercise codegen, shuffle machinery, and the parquet reader
    // once, untimed. A warmup failure (bad sfDir) must not kill the run —
    // per-query error reporting below is the honest signal.
    // The lower() touch matters: Spark 4's first case-mapping call runs
    // CollationAwareUTF8String's static init (an ICU titlecase-map build,
    // 6–26 s of CPU observed via jstack), which otherwise lands on
    // whichever measured query calls lower() first — a one-time JVM cost,
    // not that query's throughput.
    try materialize(Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.lower(
        org.apache.spark.sql.functions.col("event_type"))).count())
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }

    // Calibration: constant work (2^28 xxhash64 + xor over an in-memory
    // range), so its seconds vary ONLY with machine load — the yardstick
    // that makes cross-run comparisons honest. Median of 3, same as the
    // queries; first call runs right after warmup so JIT/codegen are
    // already paid.
    def calibrate(): Double =
      try {
        Array.fill(3) {
          val t0 = System.nanoTime()
          // bit_xor, not sum: summing 2^28 hashes overflows long under
          // ANSI (Spark 4 default); xor is closed over long.
          materialize(spark.range(1L << 28)
            .select(org.apache.spark.sql.functions.bit_xor(
              org.apache.spark.sql.functions.xxhash64(
                org.apache.spark.sql.functions.col("id")))))
          (System.nanoTime() - t0) / 1e9
        }.sorted.apply(1)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] calibration failed: ${e.getMessage}")
        -1.0
      }
    val calibSec = calibrate()

    // stream_* rows time their STREAM end-to-end (round 14), but NOT
    // their scratch fixtures (round 15): the micro-batch stream executes
    // inside the registration — watermarks, state stores, AvailableNow
    // drain — and the returned frame is only the final comparison
    // read-back, so construction-untimed methodology (right for every
    // batch row) would time 0.03–0.18 s for a row whose real cost is
    // 6–20 s at sf1. Round 14 timed the whole fn() and swept the rows'
    // scratch-fixture generation (reference tables, coalesce(1) landing
    // chunks) into the window — pin noise that produced a fresh over-pin
    // batch. Round 15: every stream row registers QueryDef.phased — the
    // fixture build runs UNTIMED, the returned thunk (stream start →
    // drain → read-back) is what's timed. Batch rows keep the
    // untimed-construction contract; a stream row WITHOUT a phased
    // registration falls back to end-to-end (never silently under-timed).
    val phased = SparkEntry.benchPhased
    def timedMedian(name: String,
                    fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      Array.fill(passes) {
        val sec = phased.get(name) match {
          case Some(build) if name.startsWith("stream_") =>
            val run = build(spark, sfDir) // fixture phase: untimed
            val t0 = System.nanoTime()
            materialize(run()) // stream start -> drain -> read-back: timed
            (System.nanoTime() - t0) / 1e9
          case _ =>
            val t0c = System.nanoTime()
            val df = fn(spark, sfDir) // batch rows: construction untimed
            val t0 =
              if (name.startsWith("stream_")) t0c else System.nanoTime()
            materialize(df)
            (System.nanoTime() - t0) / 1e9
        }
        // Drop this pass's lazily-persisted checkpoint blocks NOW:
        // per-pass fresh construction otherwise stacks 3 copies per
        // checkpointed query until the driver GCs the old plans, and
        // the resulting storage eviction / disk spill would land inside
        // LATER queries' timed windows.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        sec
      }.sorted.apply(passes / 2)
    }

    // optional trailing names: dev-loop filter (the driver passes none)
    val only = args.toSet
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      try (name, timedMedian(name, fn), true)
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        (name, -1.0, false)
      }
    }

    // Contention hygiene (round 8 — the round-7 driver capture was 1.5×
    // inflated by machine load and the verdict chased phantom
    // regressions): BENCH_REF.json pins a known-uncontended per-query
    // reference (update it deliberately when plans change; its history
    // array keeps every prior pin so drift is auditable). Any row
    // landing over 1.5× its reference AFTER CALIBRATION NORMALIZATION
    // (round 12 — raw ratios conflate machine load with regression: the
    // yardstick ratio refCalib/calibSec rescales this run's seconds to
    // the pin run's machine speed, so "everything 2× slower including
    // the constant-work yardstick" no longer triggers 200 useless
    // reruns, and a real single-row regression on an IDLE box triggers
    // at its true ratio) gets ONE re-run at a different point in time
    // and keeps the better median — transient load rarely hits the same
    // row twice — and a second calibration after the loop bounds how
    // the load changed across the run. (Round 10: trigger lowered
    // 2.0→1.5 — four r9 rows sat at 1.5–1.9× their pins with unchanged
    // plans and never got re-measured.)
    val refPath = java.nio.file.Paths.get("BENCH_REF.json")
    val (ref: Map[String, Double], refCalib: Double) =
      if (!java.nio.file.Files.exists(refPath)) (Map.empty[String, Double], -1.0)
      else {
        val txt = new String(java.nio.file.Files.readAllBytes(refPath),
          java.nio.charset.StandardCharsets.UTF_8)
        // the reference is only comparable at its own scale factor
        if (!txt.contains("\"sf\":\"" + sfDir + "\"")) (Map.empty[String, Double], -1.0)
        else {
          // parse ONLY the prefix before the append-only "history" array:
          // pin entries in history carry their own calib_sec keys AND full
          // queries maps, and a whole-file scan would silently normalize
          // against a stale calibration — or let a history pin's queries
          // override current values via toMap last-wins
          val head = txt.indexOf("\"history\"") match {
            case -1 => txt
            case i => txt.substring(0, i)
          }
          val qblock = head.substring(head.indexOf("\"queries\":{") + 11)
          val rc = "\"calib_sec\":\\s*(-?[0-9][0-9.eE+-]*)".r
            .findFirstMatchIn(head).map(_.group(1).toDouble).getOrElse(-1.0)
          ("\"([A-Za-z0-9_]+)\":(-?[0-9][0-9.eE+-]*)".r.findAllMatchIn(qblock)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap, rc)
        }
      }
    // seconds × normFactor ≈ what this row would have cost on the pin
    // run's machine; 1.0 when either calibration is unusable
    val normFactor =
      if (refCalib > 0 && calibSec > 0) refCalib / calibSec else 1.0
    var rerunBudget = 32 // bound the hygiene pass, it must not double the run
    // every re-measured row's FIRST-pass value is preserved and published
    // in BENCH_FULL.json: math.min() below is a one-sided load rescue, and
    // without the first pass on record a real regression could hide behind
    // a stale BENCH_REF entry
    val rerunFirstPass = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val results = firstPass.map { case (name, v, ok) =>
      val suspect = ok && rerunBudget > 0 &&
        ref.get(name).exists(rv =>
          rv > 0 && v > 0.15 && v * normFactor > 1.5 * rv)
      if (!suspect) (name, v, ok)
      else {
        rerunBudget -= 1
        val v2 = try timedMedian(name, SparkEntry.queries(name))
        catch { case _: Throwable => v }
        rerunFirstPass(name) = v
        if (v2 < v) System.err.println(
          f"[bench] $name re-measured $v%.3f -> $v2%.3f (ref ${ref(name)}%.3f)")
        (name, math.min(v, v2), ok)
      }
    }
    val reran = 32 - rerunBudget
    val calibEnd = calibrate()
    // contended when the better yardstick is off this box's unloaded band,
    // or one yardstick is off AND they drifted apart (load changed
    // mid-run). Drift ALONE is not a signal: the start calibration runs
    // ~2× the end one even on an idle box (JVM warm-up residue — measured
    // 0.30/0.15 idle vs 0.49/0.15 loaded), so an unconditional drift flag
    // would cry wolf every run.
    val worst = math.max(calibSec, calibEnd)
    val best = math.min(calibSec, calibEnd)
    val contended = (best > 0 && best > 0.45) ||
      (best > 0 && worst > 0.45 && worst > 1.5 * best)
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum

    // FULL per-query timings go to a file: the driver that turns stdout
    // into BENCH_r{N}.json keeps only the LAST ~2000 characters of output,
    // and with 160+ registered queries the full map is ~5 KB — every
    // round through r6 the JSON line was cut mid-map and recorded as
    // `parsed: null`. The file (committed with the round snapshot) holds
    // everything; stdout carries a line guaranteed to fit the tail window.
    // rows still over 1.5× their pin AFTER normalization AND the rerun
    // rescue: the attributable-regression list a reader investigates —
    // everything else in the delta vs BENCH_REF is measured machine load
    val overPin = results.collect {
      case (name, v, true) if ref.get(name)
        .exists(rv => rv > 0 && v > 0.15 && v * normFactor > 1.5 * rv) =>
        name
    }
    val overPinJson = overPin.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullJson = {
      val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      // the calibration-normalized map: seconds rescaled to the pin
      // run's machine speed — the directly-comparable-to-BENCH_REF view
      val qn = results.map { case (k, v, _) =>
        "\"" + k + "\":" + (if (v < 0) v else v * normFactor) }
        .mkString("{", ",", "}")
      val rr = rerunFirstPass.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec","units":{"queries":"raw_sec_this_machine","queries_norm":"sec_at_pin_calibration","over_pin":"judged_on_queries_norm"},"calib_sec":$calibSec,"calib_sec_end":$calibEnd,"calib_ref":$refCalib,"norm_factor":$normFactor,"contended":$contended,"reran":$reran,"rerun_first_pass":$rr,"over_pin":$overPinJson,"n_queries":${results.size},"queries":$qs,"queries_norm":$qn,"failed":$failed,"sf":"$sfDir"}"""
    }
    val fullPath = java.nio.file.Paths.get("BENCH_FULL.json")
    // a filtered dev run must not clobber the committed full-suite map
    if (only.isEmpty) {
      java.nio.file.Files.write(fullPath,
        fullJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

    // stdout line: 3-decimal values, and the per-query map filled to a
    // byte budget — TPC-H rows first (the headline suite), then the
    // slowest of the rest (the rows a reader checks for regressions).
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val ok = results.collect { case (k, v, true) => (k, v) }
    val tpch = ok.filter(_._1.matches("q\\d+_.*")).sortBy(_._1)
    val rest = ok.filterNot(_._1.matches("q\\d+_.*")).sortBy(-_._2)
    // both series ride the tail, explicitly named (round 13 — the r12
    // artifact carried only raw values while over_pin is judged on
    // normalized ones, inviting a false regression reading): each entry
    // is "name":[raw,norm] under a units key that names the two slots.
    val head = s"""{"metric":"total","value":${r3(total)},"unit":"sec","units":{"queries":"[raw_sec,sec_at_pin_calibration]","over_pin":"judged_on_normalized"},"calib_sec":${r3(calibSec)},"calib_sec_end":${r3(calibEnd)},"norm_factor":${r3(normFactor)},"contended":$contended,"reran":$reran,"over_pin":$overPinJson,"n_queries":${results.size},"queries_full":"${fullPath.toAbsolutePath}","failed":$failed,"sf":"$sfDir","queries":{"""
    val tail = "}}"
    val budget = 1700 - head.length - tail.length
    val entries = scala.collection.mutable.ListBuffer.empty[String]
    var used = 0
    (tpch ++ rest).foreach { case (k, v) =>
      val e = "\"" + k + "\":[" + r3(v) + "," +
        r3(if (v < 0) v else v * normFactor) + "]"
      val sep = if (entries.isEmpty) 0 else 1
      if (used + sep + e.length <= budget) { entries += e; used += sep + e.length }
    }
    println(head + entries.mkString(",") + tail)
    spark.stop()
  }
}
