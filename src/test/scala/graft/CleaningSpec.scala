package graft

import org.apache.spark.sql.functions._

import graft.functions.cleaning

/** Pins the reference's scalar cleaning semantics (SURVEY.md §2b):
  * parse_numeric_val's value table (train.py:37-59), the case-SENSITIVE
  * impact map (train.py:333-334 — 'High' → 0 is reference behavior, not a
  * bug), text null-normalization (main.py:148-151), and the 9-format date
  * parse order (main.py:126-135). */
class CleaningSpec extends SparkSpecBase {
  import spark.implicits._

  private def parseNum(s: String): Option[Double] =
    Seq(Option(s)).toDF("v")
      .select(cleaning.parseNumeric(col("v")).as("p"))
      .collect().head.getAs[Any]("p") match {
      case null => None
      case d: Double => Some(d)
    }

  test("F1 parse_numeric value table (train.py:37-59)") {
    assert(parseNum("5.2%") === Some(5.2))
    assert(parseNum("5.2%%") === Some(5.2)) // %+$ strip, like rstrip('%')
    assert(parseNum("1.2K") === Some(1200.0))
    assert(parseNum("1.2k") === Some(1200.0))
    assert(parseNum("3.4M") === Some(3.4e6))
    assert(parseNum("1.1B") === Some(1.1e9))
    assert(parseNum("2T") === Some(2e12))
    assert(parseNum("-0.3") === Some(-0.3))
    assert(parseNum("+4") === Some(4.0))
    assert(parseNum("  7.5  ") === Some(7.5)) // stripped first
    // str.strip() removes ALL whitespace, not just spaces (round 15)
    assert(parseNum("\t5.2\n") === Some(5.2))
    // float(val.rstrip('%')) tolerates whitespace before the '%'
    assert(parseNum("5.2 %") === Some(5.2))
    assert(parseNum("\t5.2 %\r") === Some(5.2))
    assert(parseNum("1e3") === Some(1000.0)) // Python float() accepts exponents
    assert(parseNum("") === None)
    assert(parseNum("   ") === None)
    assert(parseNum("N/A") === None)
    assert(parseNum(null) === None)
    assert(parseNum("abc") === None)
    assert(parseNum("nan") === None) // float('nan') is NaN, but the engine maps non-finite to null
    assert(parseNum("inf") === None)
    assert(parseNum("1.2X") === None) // unknown suffix
  }

  test("F6 ordinal encode is case-sensitive with default 0 (train.py:333-334)") {
    val m = Map("low" -> 1, "medium" -> 2, "high" -> 3)
    val out = Seq("low", "medium", "high", "High", "HIGH", "holiday", null)
      .toDF("v")
      .select(cleaning.ordinalEncode(col("v"), m).as("o"))
      .collect().map(_.getAs[Int]("o")).toSeq
    assert(out === Seq(1, 2, 3, 0, 0, 0, 0))
  }

  test("F5 clean_text maps ''/nan/none/null (any case) and NULL to N/A (main.py:148-151)") {
    val out = Seq("", "nan", "NaN", "None", "NULL", "  x  ", null,
      "\tnan\n", "\u000bx\r")
      .toDF("v")
      .select(cleaning.cleanText(col("v")).as("c"))
      .collect().map(_.getAs[String]("c")).toSeq
    assert(out === Seq("N/A", "N/A", "N/A", "N/A", "N/A", "x", "N/A",
      "N/A", "x"))
  }

  test("F2 all 9 date formats parse; garbage yields null (main.py:126-135)") {
    val inputs = Seq(
      "2025-01-05", "5 January 2025", "01/05/2025", "05/01/2025",
      "2025/01/05", "01-05-2025", "05-01-2025", "Jan 5, 2025",
      "January 5, 2025")
    val parsed = inputs.toDF("v")
      .select(cleaning.parseDate(col("v")).as("d"))
      .collect().map(_.getAs[java.sql.Date]("d")).toSeq
    val jan5 = java.sql.Date.valueOf("2025-01-05")
    val may1 = java.sql.Date.valueOf("2025-05-01")
    // Day-first inputs "05/01/2025" and "05-01-2025" hit the M/d format
    // FIRST in the try order, so they resolve to May 1 — the reference's
    // ambiguity behavior (main.py:129-130), preserved deliberately.
    assert(parsed === Seq(jan5, jan5, jan5, may1, jan5, jan5, may1, jan5, jan5))
    val bad = Seq("not a date", "2025-13-45", "").toDF("v")
      .select(cleaning.parseDate(col("v")).as("d"))
      .collect().map(_.getAs[java.sql.Date]("d")).toSeq
    assert(bad.forall(_ == null))
  }

  test("F2 ambiguous day/month resolves by try order (M/d first), like the reference") {
    val d = Seq("01/02/2025").toDF("v")
      .select(cleaning.parseDate(col("v")).as("d"))
      .collect().head.getAs[java.sql.Date]("d")
    assert(d === java.sql.Date.valueOf("2025-01-02")) // Jan 2, not Feb 1
  }

  test("F3 time formats 24h and 12h parse; junk yields null (main.py:137-146)") {
    val out = Seq("17:03", "5:03 PM", "5:03 AM", "xx",
      // CPython %M accepts one digit and %p matches case-insensitively
      // (round 15): the reference parses all of these
      "7:5", "7:30 pm", "\t17:03\n")
      .toDF("v")
      .select(cleaning.parseTime(col("v")).as("t"))
      .collect().map(_.getAs[String]("t")).toSeq
    assert(out === Seq("17:03:00", "17:03:00", "05:03:00", null,
      "07:05:00", "19:30:00", "17:03:00"))
  }

  test("F3 timedelta TIME artifact: last token parses, malformed 'days' falls back to midnight (train.py:88-101)") {
    val out = Seq("0 days 17:00:00", "1 days 03:05:00", "0 days 9:30",
      "2 days ago", "0 days xx:yy",
      // the reference int()-parses each colon part: single-digit
      // minutes/seconds are valid (round 15)
      "0 days 17:0:5")
      .toDF("v")
      .select(cleaning.parseTime(col("v")).as("t"))
      .collect().map(_.getAs[String]("t")).toSeq
    assert(out === Seq("17:00:00", "03:05:00", "09:30:00",
      "00:00:00", "00:00:00", "17:00:05"))
  }

  test("F7 fill dim: null to Unknown, else trimmed (train.py:335-336)") {
    val out = Seq("  USD ", null).toDF("v")
      .select(cleaning.fillDim(col("v")).as("c"))
      .collect().map(_.getAs[String]("c")).toSeq
    assert(out === Seq("USD", "Unknown"))
  }
}
