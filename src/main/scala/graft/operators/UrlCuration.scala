package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level corpus curation — the acquisition-side gate every web-scale
  * training pipeline runs BEFORE any content filter (RefinedWeb §3.1,
  * C4 §2.1): normalize raw URLs to a canonical form, drop exact-URL
  * duplicates (the cheapest dedup in the whole stack — one string key,
  * no content read), cap per-domain document counts so no single host
  * dominates the corpus, and gate against a domain blocklist.
  *
  * Everything here is string algebra over built-in codegen'd functions
  * (regexp_extract / split / filter / array_sort / concat) — no UDF, no
  * state — so the normalizer is a stateless projection legal in any
  * Structured Streaming output mode, and every verdict is reproducible
  * bit-for-bit by any engine with the same regex semantics (patterns
  * are lookahead-free: Java regex ≡ RE2 ≡ DuckDB).
  *
  * Reference analog: the pipeline's dedup-before-load hygiene
  * (`events_pipeline.py` upsert keying); the URL semantics are the
  * public C4/RefinedWeb acquisition rules. */
object UrlCuration {

  /** Query-param names stripped during normalization: tracking params
    * that never change the resource identity. `utm_*` by prefix, the
    * click-id params by name. */
  val TrackingParamPattern = "^(utm_[^=]*|gclid|fbclid|msclkid)="

  // ------------------------------------------------------------------
  // Synthesis — the corpus carries no URL column, so the family runs on
  // deterministically synthesized URLs (the mm_* PNG pattern): every
  // messy field is a pure function of (doc_id, seed) via the md5 bucket
  // chain, so the oracle re-derives the raw URL, not just the verdicts.

  /** Deterministic messy URL per document. Consecutive doc_id PAIRS
    * (base = doc_id / 2) share one canonical resource — domain
    * `d<base % 40>.example.com`, path `/p/<base>`, query `a=1&b=2` —
    * while six md5-derived bits scatter the surface form: scheme case,
    * a `WWW.` prefix, host case, an explicit `:443`, query-param order
    * + appended `utm_source`/`gclid` tracking, a `#sec` fragment, and a
    * trailing slash. Normalization must collapse every pair to one
    * canonical string; exact-URL dedup then halves the corpus. */
  def synthesizeUrls(docs: DataFrame, seed: String): DataFrame = {
    val h = Sampling.bucket(col("doc_id"), seed, "md5")
    def bit(i: Int): Column = shiftright(h, i) % 2L === 1L
    val base = (col("doc_id").cast("long") / 2L).cast("long")
    val host0 = concat(lit("d"), (base % 40L).cast("string"),
      lit(".example.com"))
    val url = concat(
      when(bit(0), lit("HTTPS")).otherwise(lit("https")), lit("://"),
      when(bit(1), lit("WWW.")).otherwise(lit("")),
      when(bit(2), upper(host0)).otherwise(host0),
      when(bit(3), lit(":443")).otherwise(lit("")),
      lit("/p/"), base.cast("string"),
      when(bit(4), lit("/")).otherwise(lit("")),
      when(bit(5), lit("?b=2&a=1&utm_source=feed&gclid=g1"))
        .otherwise(lit("?a=1&b=2")),
      when(bit(0) =!= bit(1), lit("#sec")).otherwise(lit("")))
    docs.select(col("doc_id"), url.as("url"))
  }

  // ------------------------------------------------------------------
  // Normalization

  /** Canonicalize `urlCol` into `url_norm` + `domain`, adding both
    * columns (NULL on unparseable input — a row that yields no scheme
    * or no host surfaces NULL rather than a fabricated canonical form).
    * Rules, in order: lowercase scheme and host; strip one leading
    * `www.`; drop the default port (`:80` http, `:443` https — other
    * ports survive); strip trailing slashes off the path (empty path →
    * `/`); drop tracking params ([[TrackingParamPattern]]), sort the
    * survivors bytewise, rebuild the query (empty → no `?`); drop the
    * fragment. ONE stateless projection — the serve/stream shape. */
  def normalizeUrls(frame: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = col(urlCol)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val auth = regexp_extract(rest, "^([^/?#]*)", 1)
    val host = lower(regexp_extract(auth, "^([^:]*)", 1))
    val hostN = regexp_replace(host, "^www\\.", "")
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val portN = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val pathQf = regexp_replace(rest, "^[^/?#]*", "")
    val path0 = regexp_replace(
      regexp_extract(pathQf, "^([^?#]*)", 1), "/+$", "")
    val pathN = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(pathQf, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamPattern))
    val qs = array_join(array_sort(params), "&")
    val norm = concat(scheme, lit("://"), hostN, portN, pathN,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
    frame
      .withColumn("url_norm",
        when(u.isNotNull && scheme =!= "" && hostN =!= "", norm))
      .withColumn("domain",
        when(u.isNotNull && scheme =!= "" && hostN =!= "", hostN))
  }

  /** Domain blocklist verdict as a column: true iff `domain` equals a
    * blocked entry or is a subdomain of one (`endswith("." + entry)`).
    * The list is a bounded literal riding the plan (broadcast by
    * construction); NULL domain → NULL verdict (unparseable rows never
    * silently pass a gate — the caller's coalesce chooses the policy). */
  def blocklistVerdict(domain: Column, blocked: Seq[String]): Column = {
    require(blocked.nonEmpty, "blocked list must be non-empty")
    val hit = blocked.map(b =>
      domain === lit(b) || domain.endsWith(lit("." + b))).reduce(_ || _)
    when(domain.isNotNull, hit)
  }

  // ------------------------------------------------------------------
  // Exact-URL dedup

  /** Exact dedup on `url_norm`: the FIRST document under the total
    * order (doc_id) carrying each canonical URL is `kept = true`, every
    * later echo false, NULL url_norm → NULL verdict (mode-as-data — the
    * gate composes, rows never vanish). Scale shape: global first
    * occurrence is an ALGEBRAIC `groupBy(url_norm).agg(min(doc_id))`
    * with map-side combine, joined back — a URL crawled a billion times
    * partial-aggregates per map task instead of collapsing into one
    * window task (the spanScrubGlobal shape; AQE absorbs residual join
    * skew). */
  def urlDedup(normed: DataFrame): DataFrame = {
    val firsts = normed.filter(col("url_norm").isNotNull)
      .groupBy(col("url_norm")).agg(min(col("doc_id")).as("__first"))
    normed.join(firsts, Seq("url_norm"), "left")
      .withColumn("kept",
        when(col("url_norm").isNotNull, col("doc_id") === col("__first")))
      .drop("__first")
  }

  // ------------------------------------------------------------------
  // Per-domain caps

  /** Per-domain cap, EXACT form: keep the `cap` documents per domain
    * that win a deterministic hash lottery (md5 bucket of doc_id under
    * `seed`, doc_id tiebreak — layout-invariant, no RNG). Verdict ships
    * as `cap_kept`. The domain-partitioned window is the exactness
    * price: a single viral domain funnels into one window task — at
    * corpus scale use [[domainCapThreshold]] (same lottery, no window).
    * NULL domain → NULL verdict. */
  def domainCap(normed: DataFrame, cap: Int, seed: String): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    import org.apache.spark.sql.expressions.Window
    val lot = Sampling.bucket(col("doc_id"), seed, "md5")
    val w = Window.partitionBy(col("domain"))
      .orderBy(lot.asc, col("doc_id").asc)
    val ranked = normed.filter(col("domain").isNotNull)
      .select(col("doc_id"),
        (row_number().over(w) <= cap).as("cap_kept"))
    normed.join(ranked, Seq("doc_id"), "left")
  }

  /** Per-domain cap, SCALE form: the same lottery cut as a pure
    * threshold — keep iff `bucket(doc_id) · n_domain < cap · Scale`
    * (exact integer cross-multiplication; expected survivors ≈ cap,
    * binomially concentrated — the approximate-count trade every
    * at-scale cap makes). One map-side-combinable aggregate replaces
    * the window: per-domain counts joined back onto the corpus (AQE
    * broadcasts when the domain table is small, shuffles on the
    * uniformly-wide domain key when it isn't). No per-domain task ever
    * sees more than its count row. */
  def domainCapThreshold(normed: DataFrame, cap: Int,
                         seed: String): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val counts = normed.filter(col("domain").isNotNull)
      .groupBy(col("domain")).agg(count(lit(1)).as("__n"))
    val lot = Sampling.bucket(col("doc_id"), seed, "md5")
    normed.join(counts, Seq("domain"), "left")
      .withColumn("cap_kept",
        when(col("domain").isNotNull,
          lot * col("__n") < lit(cap.toLong) * lit(Sampling.Scale)))
      .drop("__n")
  }
}
