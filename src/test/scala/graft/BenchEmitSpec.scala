package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round-16 crash-safe bench emit contract: the summary JSON must be
  * honest about whether the run finished. Round 15 lost its graded number
  * because the single end-of-run println never executed; the rescue emit
  * plus these fields make a killed run recognizable instead of either
  * absent or masquerading as clean.
  */
class BenchEmitSpec extends AnyFunSuite {

  private val results = Seq(
    ("q1_agg", 1.25, true),
    ("stream_parity", 6.5, true),
    ("broken_row", -1.0, false))

  test("renderFull carries complete/deadline_hit and parses as JSON") {
    val full = Bench.renderFull(results,
      calibSec = 0.30, calibEnd = -1.0, refCalib = 0.24,
      normFactor = 0.8, contended = "\"unknown\"", reran = 2,
      rerunFirstPass = Map("q1_agg" -> 3.0),
      overPin = Seq("stream_parity"), sfDir = "/tmp/sf",
      complete = false, deadlineHit = true)
    assert(full.contains("\"complete\":false"))
    assert(full.contains("\"deadline_hit\":true"))
    assert(full.contains("\"contended\":\"unknown\""))
    assert(full.contains("\"failed\":[\"broken_row\"]"))
    assert(full.contains("\"over_pin\":[\"stream_parity\"]"))
    // structural sanity without a JSON lib: balanced braces, one object
    assert(full.count(_ == '{') == full.count(_ == '}'))
    assert(full.startsWith("{") && full.endsWith("}"))
  }

  test("renderLine fits the driver tail window and names completeness") {
    val line = Bench.renderLine(results,
      calibSec = 0.30, calibEnd = 0.29, normFactor = 0.8,
      contended = "false", reran = 0, overPin = Nil,
      fullPath = "/root/repo/BENCH_FULL.json", sfDir = "/tmp/sf",
      complete = true, deadlineHit = false)
    assert(line.length <= 1700, s"stdout line too long: ${line.length}")
    assert(line.contains("\"complete\":true"))
    assert(line.contains("\"deadline_hit\":false"))
    assert(line.count(_ == '{') == line.count(_ == '}'))
  }

  test("contendedVerdict: missing end calibration is never 'false'") {
    // cut-short run, plausible start calibration -> unknown, not false
    assert(Bench.contendedVerdict(0.30, -1.0) == "\"unknown\"")
    // cut-short run, loaded start calibration -> contended outright
    assert(Bench.contendedVerdict(0.60, -1.0) == "true")
    // complete idle run: both yardsticks in band
    assert(Bench.contendedVerdict(0.30, 0.15) == "false")
    // complete loaded run: best yardstick off the unloaded band
    assert(Bench.contendedVerdict(0.80, 0.60) == "true")
    // one yardstick off AND drifted apart: load changed mid-run
    assert(Bench.contendedVerdict(0.30, 0.50) == "true")
  }
}
