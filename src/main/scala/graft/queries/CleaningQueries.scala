package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.cleaning
import graft.operators.Ingest

/** Oracle-paired queries for the scalar cleaning layer (SURVEY.md §2b) and
  * the ingest flow E1. The driver's DuckDB oracle only sees the parquet test
  * tables, so each query SYNTHESIZES its dirty input deterministically from
  * `events` columns — with integer-derived string building (never raw
  * double→string formatting, which differs between engines) — then parses it
  * back with the engine function under test. The oracle SQL re-implements
  * the reference semantics (train.py:37-59, main.py:126-151) independently
  * in DuckDB SQL, so agreement pins the semantics, not the implementation.
  */
object CleaningQueries {

  /** DuckDB-side re-implementation of parse_numeric_val (train.py:37-59).
    * Mirrors cleaning.parseNumeric branch-for-branch; bare TRY_CAST is NOT
    * equivalent (DuckDB accepts 'nan'/'inf', Python float()-via-regex does
    * not here). */
  private val duckFloatRe = "^[-+]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][-+]?[0-9]+)?$"
  private val duckSuffixRe = "^([-+]?[0-9]*\\.?[0-9]+)\\s*([KkMmBbTt])$"
  private def duckParseNumeric(c: String): String =
    s"""CASE
       |  WHEN $c IS NULL OR trim($c) = '' THEN NULL
       |  WHEN ends_with(trim($c), '%') THEN
       |    CASE WHEN regexp_full_match(regexp_replace(trim($c), '%+$$', ''), '$duckFloatRe')
       |         THEN CAST(regexp_replace(trim($c), '%+$$', '') AS DOUBLE) END
       |  WHEN regexp_full_match(trim($c), '$duckSuffixRe') THEN
       |    CAST(regexp_extract(trim($c), '$duckSuffixRe', 1) AS DOUBLE) *
       |    CASE upper(regexp_extract(trim($c), '$duckSuffixRe', 2))
       |      WHEN 'K' THEN 1e3 WHEN 'M' THEN 1e6 WHEN 'B' THEN 1e9 ELSE 1e12 END
       |  WHEN regexp_full_match(trim($c), '$duckFloatRe') THEN CAST(trim($c) AS DOUBLE)
       |END""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // F1 — parse_numeric over synthesized dirty strings: percent, K/M/B/T
    // suffixes (upper+lower), leading whitespace, plain decimal, N/A, empty.
    // Strings are built from CAST(round(value*100) AS BIGINT) so both
    // engines construct byte-identical input.
    "f1_parse_numeric" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .withColumn("iv", expr("CAST(round(value * 100) AS BIGINT)"))
        .withColumn("dec_str", expr(
          """concat(CASE WHEN iv < 0 THEN '-' ELSE '' END,
            |  CAST(abs(iv) DIV 100 AS STRING), '.',
            |  lpad(CAST(abs(iv) % 100 AS STRING), 2, '0'))""".stripMargin))
        .withColumn("raw", expr(
          """CASE CAST(event_id % 8 AS INT)
            |  WHEN 0 THEN concat(dec_str, '%')
            |  WHEN 1 THEN concat(dec_str, 'K')
            |  WHEN 2 THEN concat(' ', dec_str, 'M')
            |  WHEN 3 THEN concat(CAST(iv AS STRING), 'b')
            |  WHEN 4 THEN concat(dec_str, 'T')
            |  WHEN 5 THEN dec_str
            |  WHEN 6 THEN 'N/A'
            |  ELSE '' END""".stripMargin))
        .select(col("event_id"), col("raw"),
          cleaning.parseNumeric(col("raw")).as("parsed")),
      s"""WITH syn AS (
         |  SELECT event_id,
         |    CAST(round(value * 100) AS BIGINT) AS iv,
         |    concat(CASE WHEN CAST(round(value * 100) AS BIGINT) < 0 THEN '-' ELSE '' END,
         |      CAST(abs(CAST(round(value * 100) AS BIGINT)) // 100 AS VARCHAR), '.',
         |      lpad(CAST(abs(CAST(round(value * 100) AS BIGINT)) % 100 AS VARCHAR), 2, '0')) AS dec_str
         |  FROM events),
         |r AS (
         |  SELECT event_id,
         |    CASE CAST(event_id % 8 AS INT)
         |      WHEN 0 THEN concat(dec_str, '%')
         |      WHEN 1 THEN concat(dec_str, 'K')
         |      WHEN 2 THEN concat(' ', dec_str, 'M')
         |      WHEN 3 THEN concat(CAST(iv AS VARCHAR), 'b')
         |      WHEN 4 THEN concat(dec_str, 'T')
         |      WHEN 5 THEN dec_str
         |      WHEN 6 THEN 'N/A'
         |      ELSE '' END AS raw
         |  FROM syn)
         |SELECT event_id, raw, ${duckParseNumeric("raw")} AS parsed FROM r""".stripMargin),

    // F2 — multi-format date parse: each row's date rendered in one of the
    // reference's 9 ingest formats (main.py:126-135), parsed back through
    // the same try-in-order chain in both engines. Ambiguous M/d vs d/M
    // strings resolve identically because the try order is identical.
    "f2_date_parse" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .withColumn("d", col("ts").cast("date"))
        .withColumn("raw", expr(
          """CASE CAST(event_id % 9 AS INT)
            |  WHEN 0 THEN date_format(d, 'yyyy-M-d')
            |  WHEN 1 THEN date_format(d, 'd MMMM yyyy')
            |  WHEN 2 THEN date_format(d, 'M/d/yyyy')
            |  WHEN 3 THEN date_format(d, 'd/M/yyyy')
            |  WHEN 4 THEN date_format(d, 'yyyy/M/d')
            |  WHEN 5 THEN date_format(d, 'M-d-yyyy')
            |  WHEN 6 THEN date_format(d, 'd-M-yyyy')
            |  WHEN 7 THEN date_format(d, 'MMM d, yyyy')
            |  ELSE date_format(d, 'MMMM d, yyyy') END""".stripMargin))
        .select(col("event_id"), col("raw"),
          cleaning.parseDate(col("raw")).as("parsed")),
      """WITH r AS (
        |  SELECT event_id,
        |    CASE CAST(event_id % 9 AS INT)
        |      WHEN 0 THEN strftime(CAST(ts AS DATE), '%Y-%-m-%-d')
        |      WHEN 1 THEN strftime(CAST(ts AS DATE), '%-d %B %Y')
        |      WHEN 2 THEN strftime(CAST(ts AS DATE), '%-m/%-d/%Y')
        |      WHEN 3 THEN strftime(CAST(ts AS DATE), '%-d/%-m/%Y')
        |      WHEN 4 THEN strftime(CAST(ts AS DATE), '%Y/%-m/%-d')
        |      WHEN 5 THEN strftime(CAST(ts AS DATE), '%-m-%-d-%Y')
        |      WHEN 6 THEN strftime(CAST(ts AS DATE), '%-d-%-m-%Y')
        |      WHEN 7 THEN strftime(CAST(ts AS DATE), '%b %-d, %Y')
        |      ELSE strftime(CAST(ts AS DATE), '%B %-d, %Y') END AS raw
        |  FROM events)
        |SELECT event_id, raw,
        |  CAST(coalesce(
        |    try_strptime(raw, '%Y-%m-%d'), try_strptime(raw, '%d %B %Y'),
        |    try_strptime(raw, '%m/%d/%Y'), try_strptime(raw, '%d/%m/%Y'),
        |    try_strptime(raw, '%Y/%m/%d'), try_strptime(raw, '%m-%d-%Y'),
        |    try_strptime(raw, '%d-%m-%Y'), try_strptime(raw, '%b %d, %Y'),
        |    try_strptime(raw, '%B %d, %Y')) AS DATE) AS parsed
        |FROM r""".stripMargin),

    // F3 — time parse "%H:%M" then "%I:%M %p" (main.py:137-146) plus the
    // MySQL-TIME timedelta artifact "0 days HH:MM:SS" with its midnight
    // fallback (train.py:88-101); junk → NULL.
    "f3_time_parse" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .withColumn("raw", expr(
          """CASE CAST(event_id % 5 AS INT)
            |  WHEN 0 THEN date_format(ts, 'H:mm')
            |  WHEN 1 THEN date_format(ts, 'h:mm a')
            |  WHEN 2 THEN concat('0 days ', date_format(ts, 'HH:mm:ss'))
            |  WHEN 3 THEN '2 days ago' END""".stripMargin))
        .select(col("event_id"), col("raw"),
          cleaning.parseTime(col("raw")).as("parsed")),
      """WITH r AS (
        |  SELECT event_id,
        |    CASE CAST(event_id % 5 AS INT)
        |      WHEN 0 THEN strftime(ts, '%-H:%M')
        |      WHEN 1 THEN strftime(ts, '%-I:%M %p')
        |      WHEN 2 THEN concat('0 days ', strftime(ts, '%H:%M:%S'))
        |      WHEN 3 THEN '2 days ago' END AS raw
        |  FROM events)
        |SELECT event_id, raw,
        |  CASE WHEN contains(raw, 'days') THEN
        |    strftime(coalesce(
        |      try_strptime(string_split(raw, ' ')[-1], '%H:%M:%S'),
        |      try_strptime(string_split(raw, ' ')[-1], '%H:%M'),
        |      strptime('00:00:00', '%H:%M:%S')), '%H:%M:%S')
        |  ELSE strftime(coalesce(try_strptime(raw, '%H:%M'),
        |                         try_strptime(raw, '%I:%M %p')), '%H:%M:%S')
        |  END AS parsed
        |FROM r""".stripMargin),

    // F4 — datetime recombination: date string + time string → TIMESTAMP_NTZ
    // (main.py:156). Equals ts truncated to the second.
    "f4_datetime_combine" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          cleaning.combineDateTime(col("ts").cast("date"),
            date_format(col("ts"), "HH:mm:ss")).as("event_time")),
      """SELECT event_id,
        |  CAST(strftime(ts, '%Y-%m-%d') || ' ' || strftime(ts, '%H:%M:%S')
        |       AS TIMESTAMP) AS event_time
        |FROM events""".stripMargin),

    // F5 — text null-normalization: ''/nan/None/NULL/actual-null → 'N/A',
    // else trimmed (main.py:148-151).
    "f5_clean_text" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .withColumn("raw", expr(
          """CASE CAST(event_id % 6 AS INT)
            |  WHEN 0 THEN ''
            |  WHEN 1 THEN 'nan'
            |  WHEN 2 THEN 'None'
            |  WHEN 3 THEN CAST(NULL AS STRING)
            |  WHEN 4 THEN concat('  ', event_type, '  ')
            |  ELSE event_type END""".stripMargin))
        .select(col("event_id"), col("raw"),
          cleaning.cleanText(col("raw")).as("cleaned")),
      """WITH r AS (
        |  SELECT event_id,
        |    CASE CAST(event_id % 6 AS INT)
        |      WHEN 0 THEN ''
        |      WHEN 1 THEN 'nan'
        |      WHEN 2 THEN 'None'
        |      WHEN 3 THEN CAST(NULL AS VARCHAR)
        |      WHEN 4 THEN concat('  ', event_type, '  ')
        |      ELSE event_type END AS raw
        |  FROM events)
        |SELECT event_id, raw,
        |  CASE WHEN raw IS NULL OR lower(trim(raw)) IN ('', 'nan', 'none', 'null')
        |       THEN 'N/A' ELSE trim(raw) END AS cleaned
        |FROM r""".stripMargin),

    // F7 — dimension fill: NULL → 'Unknown', else trimmed
    // (train.py:335-336), over synthesized nulls and padded strings.
    "f7_fill_dims" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .withColumn("raw", expr(
          """CASE WHEN event_id % 5 = 0 THEN CAST(NULL AS STRING)
            |     WHEN event_id % 5 = 1 THEN concat('  ', event_type, ' ')
            |     ELSE event_type END""".stripMargin))
        .select(col("event_id"), col("raw"),
          cleaning.fillDim(col("raw")).as("dim")),
      """WITH r AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 5 = 0 THEN CAST(NULL AS VARCHAR)
        |         WHEN event_id % 5 = 1 THEN concat('  ', event_type, ' ')
        |         ELSE event_type END AS raw
        |  FROM events)
        |SELECT event_id, raw,
        |  CASE WHEN raw IS NULL THEN 'Unknown' ELSE trim(raw) END AS dim
        |FROM r""".stripMargin),

    // F10 — formatted date view: DATE_FORMAT(Date,'%e %M %Y') → '5 January
    // 2025' (init.sql:24-35).
    "f10_formatted_view" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          date_format(col("ts").cast("date"), "d MMMM yyyy").as("date_fmt")),
      """SELECT event_id, strftime(CAST(ts AS DATE), '%-d %B %Y') AS date_fmt
        |FROM events""".stripMargin),

    // F14 (engine extension) — calendar decomposition: the date-part
    // fields a feature store derives once per fact. The one
    // convention trap is day-of-week numbering (Spark dayofweek is
    // 1=Sunday, DuckDB dayofweek is 0=Sunday): both sides emit ISO
    // (1=Monday) explicitly — Spark `weekday()+1`, DuckDB `isodow` —
    // so the row pins the portable formulation, not an engine default.
    "f14_calendar_parts" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          year(col("ts")).cast("long").as("y"),
          quarter(col("ts")).cast("long").as("q"),
          month(col("ts")).cast("long").as("m"),
          dayofmonth(col("ts")).cast("long").as("dom"),
          (weekday(col("ts")) + lit(1)).cast("long").as("isodow"),
          weekofyear(col("ts")).cast("long").as("isoweek"),
          hour(col("ts")).cast("long").as("h"),
          expr("CAST(to_date(ts) + INTERVAL 1 MONTH AS DATE)")
            .as("next_month")),
      """SELECT event_id,
        |  CAST(year(ts) AS BIGINT) AS y,
        |  CAST(quarter(ts) AS BIGINT) AS q,
        |  CAST(month(ts) AS BIGINT) AS m,
        |  CAST(day(ts) AS BIGINT) AS dom,
        |  CAST(isodow(ts) AS BIGINT) AS isodow,
        |  CAST(weekofyear(ts) AS BIGINT) AS isoweek,
        |  CAST(hour(ts) AS BIGINT) AS h,
        |  CAST(CAST(ts AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month
        |FROM events""".stripMargin),

    // P1+P2 — column drop + fixed-order projection for insert
    // (main.py:210-212, :184).
    "p2_projection" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .drop("props")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")),
      "SELECT event_id, ts, user_id, event_type, value FROM events"),

    // SRC2 — forced-schema headerless CSV read, exercised as a round-trip:
    // write events as CSV, read back through Ingest.readCsv-style options
    // with an explicit (never inferred) schema. Oracle = the original rows.
    "src2_csv_roundtrip" -> QueryDef(
      (s, dir) => {
        // per-process scratch dir (shared Scratch factory: unique path +
        // exit-time cleanup; a fixed path would race if two harness JVMs
        // ever ran this query concurrently)
        val path = Scratch.dir("src2_csv")
        // Default CSV timestamp format truncates to millis; force µs so the
        // round-trip is lossless against the original table.
        val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
        Tables.events(s, dir)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .write.mode("overwrite").option("header", "false")
          .option("timestampNTZFormat", tsFmt).csv(path)
        s.read
          .schema("event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, value DOUBLE")
          .option("header", "false")
          .option("quote", "\"")
          .option("ignoreLeadingWhiteSpace", "true")
          .option("timestampNTZFormat", tsFmt)
          .csv(path)
      },
      "SELECT event_id, ts, user_id, event_type, value FROM events"),

    // SRC6 (engine extension) — JSON-lines round-trip over documents:
    // the interchange format crawl/annotation pipelines emit. Schema
    // forced on read (inference re-orders columns and widens types);
    // JSON string escaping makes embedded whitespace lossless.
    "src6_jsonl_roundtrip" -> QueryDef(
      (s, dir) => {
        val path = Scratch.dir("src6_jsonl")
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("source"),
            col("n_chars"), col("text"))
          .write.mode("overwrite").json(path)
        s.read
          .schema("doc_id LONG, lang STRING, source STRING, " +
            "n_chars LONG, text STRING")
          .json(path)
          .select(col("doc_id"), col("lang"), col("source"),
            col("n_chars"), col("text"))
      },
      "SELECT doc_id, lang, source, n_chars, text FROM documents"),

    // SRC7 (engine extension) — ORC round-trip: the second columnar
    // format a lakehouse ingests beside parquet; typed and lossless.
    "src7_orc_roundtrip" -> QueryDef(
      (s, dir) => {
        val path = Scratch.dir("src7_orc")
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("source"),
            col("n_chars"), col("text"))
          .write.mode("overwrite").orc(path)
        s.read.orc(path)
          .select(col("doc_id"), col("lang"), col("source"),
            col("n_chars"), col("text"))
      },
      "SELECT doc_id, lang, source, n_chars, text FROM documents"),

    // SRC3 — SQL-string query surface over a registered temp view.
    "src3_sql_surface" -> QueryDef(
      (s, dir) => {
        Tables.events(s, dir).createOrReplaceTempView("events_v")
        s.sql(
          """SELECT event_type, count(*) AS n,
            |  count(DISTINCT user_id) AS n_users
            |FROM events_v GROUP BY event_type""".stripMargin)
      },
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type""".stripMargin),

    // SNK4+A10 — row-count / empty-table probes (db_connector.py:153-162,
    // 189-193).
    "snk4_count_probe" -> QueryDef(
      (s, dir) => Tables.events(s, dir)
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) === 0).as("is_empty")),
      "SELECT count(*) AS n_rows, count(*) = 0 AS is_empty FROM events"),

    // E1/SNK1 — watermark-gated keyed upsert: an "existing" snapshot
    // (3/4 of rows) absorbs an "incoming" batch (every even id), late rows
    // beyond a 180-day watermark slack silently dropped (main.py:161-166),
    // key collisions resolved batch-wins (ON DUPLICATE KEY UPDATE,
    // main.py:175-188).
    "e1_ingest_upsert" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
        val existing = ev.filter(col("event_id") % 4 =!= 0)
        val incoming = ev.filter(col("event_id") % 2 === 0)
        graft.operators.Ingest.upsertWithWatermark(
          existing, incoming,
          key = Seq("user_id", "event_type", "ts"),
          tsCol = "ts", orderCol = "event_id",
          slack = expr("INTERVAL 180 DAYS"))
      },
      """WITH ev AS (
        |  SELECT event_id, ts, user_id, event_type, value FROM events),
        |existing AS (SELECT * FROM ev WHERE event_id % 4 <> 0),
        |wm AS (SELECT max(ts) - INTERVAL 180 DAY AS wm FROM existing),
        |fresh AS (
        |  SELECT i.* FROM ev i, wm
        |  WHERE i.event_id % 2 = 0 AND i.ts > wm.wm
        |  -- in-batch last-write-wins dedup, mirroring Ingest.upsert's
        |  -- row_number-over-orderCol (no collisions exist in this fixture,
        |  -- but the oracle must model the full upsert contract)
        |  QUALIFY row_number() OVER (PARTITION BY i.user_id, i.event_type,
        |    i.ts ORDER BY i.event_id DESC) = 1)
        |SELECT * FROM fresh
        |UNION ALL
        |SELECT e.* FROM existing e
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM fresh f
        |  WHERE f.user_id = e.user_id AND f.event_type = e.event_type
        |    AND f.ts = e.ts)""".stripMargin)
  )
}
