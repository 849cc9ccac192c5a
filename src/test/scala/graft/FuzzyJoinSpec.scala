package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** Pins the blocked-fuzzy-join semantics: verify-within-block only,
  * threshold cutoff, deterministic best-match resolution, and the loud
  * guards (overlapping column names, reserved names). */
class FuzzyJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val catalog = Seq(
    "red widget", "blue widget", "red bolt", "green ring"
  ).toDF("entity_name")

  private def candidates(probes: org.apache.spark.sql.DataFrame,
                         maxDist: Int) =
    FuzzyJoin.blockedLevenshtein(probes, catalog,
      probeText = col("q"), catalogText = col("entity_name"),
      probeBlock = element_at(split(col("q"), " "), -1),
      catalogBlock = element_at(split(col("entity_name"), " "), -1),
      maxDist = maxDist)

  test("verify within block: in-block matches found, out-of-block matches invisible") {
    val probes = Seq(
      (1L, "ed widget"),  // dist 1 to "red widget", 3 to "blue widget"
      (2L, "red bol")     // blocked under "bol" -> nothing, though dist 1 to "red bolt"
    ).toDF("probe_id", "q")
    val got = candidates(probes, maxDist = 2)
      .select("probe_id", "entity_name", "dist")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got === Set((1L, "red widget", 1)))
  }

  test("maxDist cutoff: the thresholded levenshtein's -1 never leaks") {
    val probes = Seq((1L, "rd widget")).toDF("probe_id", "q")
    // dist 1 to "red widget", 4 to "blue widget" -> only the former at maxDist 2
    val got = candidates(probes, maxDist = 2).select("entity_name", "dist")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(got.toSet === Set(("red widget", 1)))
    assert(got.forall(_._2 >= 0))
  }

  test("bestMatch: min dist wins, exact ties resolve by the tie-break column") {
    val probes = Seq((1L, "xed widget")).toDF("probe_id", "q")
    // dist 2 to BOTH "red widget" (sub) and "blue widget"? — no: blue is 3.
    // Force a true tie with two equal-dist entities instead:
    val twin = Seq("aa pin", "bb pin").toDF("entity_name")
    val cand = FuzzyJoin.blockedLevenshtein(
      Seq((7L, "cc pin")).toDF("probe_id", "q"), twin,
      probeText = col("q"), catalogText = col("entity_name"),
      probeBlock = element_at(split(col("q"), " "), -1),
      catalogBlock = element_at(split(col("entity_name"), " "), -1),
      maxDist = 2)
    val best = FuzzyJoin.bestMatch(cand, Seq("probe_id"), Seq(col("entity_name")))
    assert(best.count() === 1)
    assert(best.head().getAs[String]("entity_name") === "aa pin")
    // and the non-tied case picks the strict minimum
    val b2 = FuzzyJoin.bestMatch(candidates(probes, maxDist = 2),
      Seq("probe_id"), Seq(col("entity_name")))
    assert(b2.head().getAs[String]("entity_name") === "red widget")
  }

  test("guards: shared column names and reserved names fail loud") {
    val probes = Seq((1L, "ed widget")).toDF("probe_id", "entity_name")
    assertThrows[IllegalArgumentException] {
      FuzzyJoin.blockedLevenshtein(probes, catalog,
        col("entity_name"), col("entity_name"), lit(1), lit(1), 2)
    }
    val reserved = Seq((1L, "ed widget", 0)).toDF("probe_id", "q", "dist")
    assertThrows[IllegalArgumentException] {
      FuzzyJoin.blockedLevenshtein(reserved, catalog,
        col("q"), col("entity_name"), lit(1), lit(1), 2)
    }
  }
}
