package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Scalar cleaning layer reproducing the reference's row-wise Python helpers
  * as pure, codegen-friendly `Column` expressions (no UDFs).
  *
  * Reference semantics (cited file:line are relative to /root/reference):
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

  /** Cast to double, NULL (not error) on malformed input. */
  def tryDouble(c: Column): Column =
    when(c.rlike(FloatRe), c.cast(DoubleType))

  /** "5.2%"→5.2, "1.2K"→1200.0, "3.4M"→3.4e6, "-0.3"→-0.3, ""/junk→NULL.
    * Mirrors parse_numeric_val (train.py:37-59): strip, empty→None,
    * percent-strip (all trailing '%'), K/M/B/T suffix multiply, plain float,
    * else None. */
  def parseNumeric(c: Column): Column = {
    val s = trim(c.cast(StringType))
    when(c.isNull || s === "", lit(null).cast(DoubleType))
      .when(s.endsWith("%"), tryDouble(regexp_replace(s, "%+$", "")))
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

  /** Multi-format date parse; NULL when no format matches (main.py:126-135). */
  def parseDate(c: Column): Column = {
    val s = trim(c.cast(StringType))
    to_date(coalesce(DateFormats.map(f => try_to_timestamp(s, lit(f))): _*))
  }

  /** Time formats "%H:%M" then "%I:%M %p" (main.py:141). Returns the time
    * as a canonical "HH:mm:ss" string (Spark has no TIME type). */
  val TimeFormats: Seq[String] = Seq("H:mm", "h:mm a")

  def parseTime(c: Column): Column = {
    val s = trim(c.cast(StringType))
    date_format(coalesce(TimeFormats.map(f => try_to_timestamp(s, lit(f))): _*),
      "HH:mm:ss")
  }

  /** Date string + time string → TIMESTAMP_NTZ (main.py:156 recombination). */
  def combineDateTime(dateCol: Column, timeCol: Column): Column =
    try_to_timestamp(concat_ws(" ", date_format(dateCol, "yyyy-MM-dd"), timeCol),
      lit("yyyy-MM-dd HH:mm:ss")).cast("timestamp_ntz")

  /** trim; ""/nan/none/null (case-insensitive) or NULL → "N/A" (main.py:148-151). */
  def cleanText(c: Column): Column = {
    val t = trim(c.cast(StringType))
    when(c.isNull || lower(t).isin("", "nan", "none", "null"), lit("N/A"))
      .otherwise(t)
  }

  /** Ordinal-encode against a case-SENSITIVE literal map, unmatched → 0
    * (train.py:333-334 — note 'High' → 0 is reference behavior). */
  def ordinalEncode(c: Column, mapping: Map[String, Int]): Column =
    coalesce(try_element_at(typedLit(mapping), c), lit(0))

  /** NULL → "Unknown", else trim (train.py:335-336). */
  def fillDim(c: Column): Column =
    coalesce(trim(c.cast(StringType)), lit("Unknown"))
}
