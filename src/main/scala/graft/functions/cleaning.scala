package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Scalar cleaning layer reproducing the reference's row-wise Python helpers
  * as pure, codegen-friendly `Column` expressions (no UDFs).
  *
  * Reference semantics (cited file:line are relative to
  * `/root/reference/GCP Pipeline 2025/`):
  *  - parse_numeric_val: `fastapi model/ML Pipeline/train.py:37-59`
  *  - parse_date (9 formats): `MySQL Data Push Scripts/main.py:126-135`
  *  - parse_time (2 formats): `MySQL Data Push Scripts/main.py:137-146`
  *  - clean_text: `MySQL Data Push Scripts/main.py:148-151`
  *  - impact ordinal map: `fastapi model/ML Pipeline/train.py:333-334`
  *  - dim fill "Unknown": `fastapi model/ML Pipeline/train.py:335-336`
  *
  * All expressions are ANSI-safe (Spark 4 defaults): every cast that can
  * fail is guarded by an rlike() regex or uses a try_* variant, so malformed
  * input yields NULL exactly like the reference's try/except → None.
  */
object cleaning {

  /** Suffix form `^([-+]?[0-9]*\.?[0-9]+)\s*([KkMmBbTt])$` (train.py:50). */
  val NumSuffixRe = "^([-+]?[0-9]*\\.?[0-9]+)\\s*([KkMmBbTt])$"

  /** Strings Python's float() accepts (the subset that appears in data):
    * optional sign, digits with optional dot, optional exponent. */
  val FloatRe = "^[-+]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][-+]?[0-9]+)?$"

  private val suffixMult: Column =
    typedLit(Map("K" -> 1e3, "M" -> 1e6, "B" -> 1e9, "T" -> 1e12))

  /** Python str.strip(): removes ALL leading/trailing whitespace, not
    * just 0x20 spaces — Spark's trim() strips spaces only, so a
    * tab/newline/CR-padded value parsed in the reference but NULLed
    * here (round 15). Every helper below strips through this. */
  private def strip(c: Column): Column =
    regexp_replace(c.cast(StringType), "^\\s+|\\s+$", "")

  /** Cast to double, NULL (not error) on malformed input. */
  def tryDouble(c: Column): Column =
    when(c.rlike(FloatRe), c.cast(DoubleType))

  /** "5.2%"→5.2, "1.2K"→1200.0, "3.4M"→3.4e6, "-0.3"→-0.3, ""/junk→NULL.
    * Mirrors parse_numeric_val (train.py:37-59): strip, empty→None,
    * percent-strip (all trailing '%'), K/M/B/T suffix multiply, plain float,
    * else None. */
  def parseNumeric(c: Column): Column = {
    val s = strip(c)
    when(c.isNull || s === "", lit(null).cast(DoubleType))
      // float(val.rstrip("%")) tolerates whitespace between the number
      // and the '%' (Python float strips it) — strip again after
      // removing the trailing %'s (round 15: "5.2 %" parsed to 5.2 in
      // the reference, NULL here)
      .when(s.endsWith("%"), tryDouble(strip(regexp_replace(s, "%+$", ""))))
      .when(s.rlike(NumSuffixRe),
        regexp_extract(s, NumSuffixRe, 1).cast(DoubleType) *
          try_element_at(suffixMult, upper(regexp_extract(s, NumSuffixRe, 2))))
      .otherwise(tryDouble(s))
  }

  /** The 9 ingest date formats, tried in reference order (main.py:129-130).
    * Java DateTimeFormatter equivalents of the strptime patterns; single
    * letters accept both padded and unpadded fields like strptime does. */
  val DateFormats: Seq[String] = Seq(
    "yyyy-M-d", "d MMMM yyyy", "M/d/yyyy", "d/M/yyyy", "yyyy/M/d",
    "M-d-yyyy", "d-M-yyyy", "MMM d, yyyy", "MMMM d, yyyy")

  /** Multi-format date parse; NULL when no format matches (main.py:126-135).
    *
    * Each format is gated by a cheap shape regex so a row attempts ~1
    * `try_to_timestamp` instead of failing through up to 9 — Java
    * format-parse failure is exception-driven, so an ungated coalesce chain
    * spends its time in exception control flow (~25 s/1e4 rows at sf0.1 vs
    * ~1 s gated). The shape classes are mutually exclusive, so gate order
    * does not matter; within the two ambiguous classes (slash and
    * dash-with-trailing-year) the formats are coalesced in reference order
    * (M/d before d/M, M-d before d-M), preserving first-match-wins
    * semantics exactly. */
  def parseDate(c: Column): Column = {
    val s = strip(c)
    def t(f: String) = try_to_timestamp(s, lit(f))
    to_date(
      when(s.rlike("^\\d{4}-\\d{1,2}-\\d{1,2}$"), t("yyyy-M-d"))
        .when(s.rlike("^\\d{1,2} [A-Za-z]+ \\d{4}$"), t("d MMMM yyyy"))
        .when(s.rlike("^\\d{1,2}/\\d{1,2}/\\d{4}$"),
          coalesce(t("M/d/yyyy"), t("d/M/yyyy")))
        .when(s.rlike("^\\d{4}/\\d{1,2}/\\d{1,2}$"), t("yyyy/M/d"))
        .when(s.rlike("^\\d{1,2}-\\d{1,2}-\\d{4}$"),
          coalesce(t("M-d-yyyy"), t("d-M-yyyy")))
        .when(s.rlike("^[A-Za-z]{3} \\d{1,2}, \\d{4}$"), t("MMM d, yyyy"))
        .when(s.rlike("^[A-Za-z]+ \\d{1,2}, \\d{4}$"), t("MMMM d, yyyy")))
  }

  /** Time formats "%H:%M" then "%I:%M %p" (main.py:141). Returns the time
    * as a canonical "HH:mm:ss" string (Spark has no TIME type). CPython's
    * %M/%S accept ONE OR TWO digits ([0-5]\d|\d) and %p matches case-
    * insensitively, so the patterns use single letters (m/s = 1-2
    * digits) and the am/pm branch parses the uppercased string —
    * round 15: "7:5" and "7:30 pm" parsed in the reference, NULLed
    * here. */
  val TimeFormats: Seq[String] = Seq("H:m", "h:m a")

  /** Shape-gated like [[parseDate]]: the 24h, am/pm, and timedelta forms
    * are syntactically disjoint, so each row attempts ~one format.
    *
    * The 'days' branch is the MySQL TIME artifact (train.py:88-101): a
    * TIME column read through pandas arrives as a timedelta string like
    * "0 days 17:00:00"; the reference takes the LAST space-separated
    * token as the clock time and falls back to MIDNIGHT (never null) when
    * that token doesn't parse — both behaviors reproduced here. */
  def parseTime(c: Column): Column = {
    val s = strip(c)
    val lastTok = element_at(split(s, " "), -1)
    date_format(
      // the timedelta branch int()-parses each colon part, so single-
      // digit minutes/seconds are valid ("0 days 17:0:5" → 17:00:05) —
      // single-letter patterns match that (round 15)
      when(s.contains("days"), coalesce(
        try_to_timestamp(lastTok, lit("H:m:s")),
        try_to_timestamp(lastTok, lit("H:m")),
        try_to_timestamp(lit("00:00:00"), lit("HH:mm:ss"))))
        .when(s.rlike("^\\d{1,2}:\\d{1,2}$"), try_to_timestamp(s, lit("H:m")))
        .when(s.rlike("^\\d{1,2}:\\d{1,2} [AaPp][Mm]$"),
          try_to_timestamp(upper(s), lit("h:m a"))),
      "HH:mm:ss")
  }

  /** Date string + time string → TIMESTAMP_NTZ (main.py:156 recombination). */
  def combineDateTime(dateCol: Column, timeCol: Column): Column =
    try_to_timestamp(concat_ws(" ", date_format(dateCol, "yyyy-MM-dd"), timeCol),
      lit("yyyy-MM-dd HH:mm:ss")).cast("timestamp_ntz")

  /** trim; ""/nan/none/null (case-insensitive) or NULL → "N/A" (main.py:148-151). */
  def cleanText(c: Column): Column = {
    val t = strip(c)
    when(c.isNull || lower(t).isin("", "nan", "none", "null"), lit("N/A"))
      .otherwise(t)
  }

  /** Ordinal-encode against a case-SENSITIVE literal map, unmatched → 0
    * (train.py:333-334 — note 'High' → 0 is reference behavior). */
  def ordinalEncode(c: Column, mapping: Map[String, Int]): Column =
    coalesce(try_element_at(typedLit(mapping), c), lit(0))

  /** NULL → "Unknown", else strip (train.py:335-336). */
  def fillDim(c: Column): Column =
    coalesce(strip(c), lit("Unknown"))
}
