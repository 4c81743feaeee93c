package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus extraction: HTML → text and URL → host/domain/path —
  * the stage every WARC/WET-derived training corpus (C4, CCNet,
  * RefinedWeb) runs BEFORE quality scoring and dedup. All pure per-row
  * projections over codegen'd built-ins (`regexp_replace` /
  * `regexp_extract` / array ops): no UDF, no shuffle, linear in
  * partitions — at 100 TB this runs at scan speed, and the patterns
  * stay inside RE2's subset (no backreferences/lookaround) so the
  * DuckDB oracle mirrors them verbatim.
  *
  * This is an EXTRACTOR, not a sanitizer: `stripHtml` output is for
  * model-training text, not for safe re-display (no attempt to defeat
  * adversarial markup).
  */
object WebText {

  /** Tag-stripped, entity-decoded, whitespace-collapsed text of an HTML
    * payload: `script`/`style` blocks drop WITH their content, every
    * remaining tag becomes a space, the six ubiquitous entities decode
    * (`&amp;` last, so `&amp;lt;` stays literal `&lt;` — the standard
    * single-pass approximation), and runs of whitespace collapse to one
    * space. Line-oriented quality signals (`fracBulletLines`) should run
    * on pre-collapse text; this output feeds token/ngram stages.
    * {{{
    * docs.select(WebText.stripHtml(col("html")).as("text"))
    * }}} */
  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => regexp_replace(c, e, v) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Fraction of the stripped text's characters that live inside `<a>`
    * anchors — the jusText/trafilatura boilerplate signal (navigation
    * and link farms score near 1, prose near 0). 0.0 for anchor-free or
    * empty documents. */
  def linkDensity(html: Column): Column = {
    val anchorChars = aggregate(
      transform(regexp_extract_all(html, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)),
        x => length(trim(regexp_replace(
          regexp_replace(x, "<[^>]+>", " "), "\\s+", " ")))),
      lit(0), (acc, x) => acc + x)
    val total = length(stripHtml(html))
    when(total > 0, least(anchorChars.cast("double") / total, lit(1.0)))
      .otherwise(lit(0.0))
  }

  /** Lowercased host of a URL: the authority minus userinfo and port.
    * Bracketed IPv6 authorities (`https://[::1]:8080/x`) yield the
    * address inside the brackets — the naive first-colon port split
    * would truncate them to `[`. Empty string when `url` has no
    * `scheme://` authority (mirrors `regexp_extract`'s no-match value,
    * so the column stays null-free over dirty corpora). */
  def urlHost(url: Column): Column = {
    val auth = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    val noUser = regexp_replace(auth, "^[^@]*@", "")
    val bracketed = regexp_extract(noUser, "^\\[([^\\]]*)\\]", 1)
    lower(when(bracketed =!= "", bracketed)
      .otherwise(regexp_extract(noUser, "^([^:]+)", 1)))
  }

  /** Path component of a URL (query/fragment dropped); `/` for an
    * empty path so grouping by path never mixes "no path" with
    * unparseable rows. */
  def urlPath(url: Column): Column =
    coalesce(nullif(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1), lit("")), lit("/"))

  /** Multi-label public suffixes the [[registeredDomain]] heuristic
    * recognizes (the high-traffic ccTLD second-level registries). A
    * full public-suffix-list lookup is a broadcast-join against the
    * published PSL; this built-in set covers the common cases without
    * an external file. */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "net.uk",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.in", "net.in", "org.in", "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "co.kr", "or.kr",
    "com.mx", "com.tr", "com.tw", "co.za", "com.sg", "com.hk", "co.nz")

  /** Registered domain (eTLD+1) of a host — the unit per-domain caps
    * and domain-mix stats group by: last two labels, or last three when
    * the two-label tail is a known multi-label suffix
    * ([[MultiLabelSuffixes]]). Null for an empty/null host. */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    def tail(n: Int) = array_join(slice(labels, -n, n), ".")
    when(host.isNull || host === "", lit(null).cast("string"))
      .when(size(labels) <= 2, host)
      .when(tail(2).isin(MultiLabelSuffixes: _*), tail(3))
      .otherwise(tail(2))
  }

  /** [[registeredDomain]] straight from a URL. */
  def urlDomain(url: Column): Column = registeredDomain(urlHost(url))

  /** Query parameters dropped by [[urlCanonicalize]]: the tracking
    * params that vary per click without changing the fetched content.
    * `(=|$)` accepts BARE params too (`?gclid` with no value is still
    * tracking noise). */
  val TrackingParamPattern: String =
    "^(utm_[^=&]*|gclid|fbclid|ref|ref_src|mc_cid|mc_eid)(=|$)"

  /** Canonical URL dedup key — the fuzzy-URL-dedup unit (C4-style
    * corpora dedupe by URL before any content pass): lowercased host
    * with `www.` and userinfo/port stripped, trailing-slash-normalized
    * path, tracking params ([[TrackingParamPattern]]) dropped and the
    * survivors SORTED (param order is transport noise), fragment
    * dropped. Unparseable rows fall back to `lower(url)` so they still
    * group exactly. Pure per-row projection. */
  def urlCanonicalize(url: Column): Column = {
    val host = regexp_replace(urlHost(url), "^www\\.", "")
    val path = urlPath(url)
    val cpath = when(path === "/", lit(""))
      .otherwise(regexp_replace(path, "/+$", ""))
    val qs = regexp_extract(url, "\\?([^#]*)", 1)
    val params = filter(split(qs, "&"),
      p => p =!= "" && !p.rlike(TrackingParamPattern))
    val cq = array_join(array_sort(params), "&")
    when(host === "", lower(url)).otherwise(concat(host, cpath,
      when(cq =!= "", concat(lit("?"), cq)).otherwise(lit(""))))
  }
}
