package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and registered-domain extraction — the curation
  * primitives every web-scale corpus build applies over its link columns
  * (the C4 / RefinedWeb / FineWeb preprocessing shape) before per-domain
  * gating. The reference builds record URLs from identifiers
  * (`main.py:176-277`, the F6 link formatters in [[Normalize]]); this tier
  * adds the inverse direction — given a URL column, normalize it and name
  * its owner — so caps and blocklists can be expressed per REGISTERED
  * domain, not per raw string.
  *
  * Everything here is composed Spark built-ins (regexp over strings), so
  * the whole tier stays inside whole-stage codegen, and every rule has an
  * exact DuckDB mirror (the oracle replays the same regexes) — no UDFs,
  * no driver round-trips, no state.
  *
  * Canonicalization policy (documented contract, pinned by spec + oracle):
  *   1. trim surrounding whitespace;
  *   2. strip the fragment (`#` to end — never load-bearing for identity);
  *   3. lowercase `scheme://authority` ONLY (path and query stay
  *      case-sensitive, per RFC 3986 §6.2.2.1);
  *   4. strip the scheme's default port (`:80` http, `:443` https);
  *   5. strip trailing slashes from the path (uniformly, including the
  *      bare root — `https://a.com/` and `https://a.com` are one key).
  * A value with no `scheme://authority` prefix is not a URL for curation
  * purposes and canonicalizes to NULL (callers drop or quarantine).
  *
  * Out of contract (documented, not silently wrong): IPv6 bracket hosts,
  * trailing-dot FQDNs (`example.com.` passes through whole), percent-
  * encoding equivalence, and internationalized domain names (IDNA) —
  * each would need a real URL parser, and none appears in bibliographic
  * link columns.
  */
object Urls {

  /** `scheme://authority` prefix — scheme per RFC 3986 (letter, then
    * letters/digits/`+.-`), authority everything up to the first
    * `/`, `?`, or `#`. */
  private val schemeAuthRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"

  /** Built-in multi-part public-suffix set: the common two-label eTLDs.
    * A full Public Suffix List is a runtime data file; this pinned subset
    * covers the frequent cases and is part of the documented contract
    * (the oracle embeds the same list — see `SparkEntry.oracleSql`). */
  val multiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "com.br", "com.cn", "com.sg", "com.tr", "com.mx", "com.hk",
    "com.tw", "com.ar", "co.in", "co.nz", "co.za", "co.kr")

  /** Steps 1–5 above as one codegen'd expression; NULL for non-URLs. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    val auth = lower(regexp_extract(noFrag, s"($schemeAuthRe)", 1))
    val rest = regexp_replace(noFrag, schemeAuthRe, "")
    val path = regexp_replace(rest, "[?].*$", "")
    val query = regexp_extract(rest, "([?].*)$", 1)
    val authNoPort =
      when(auth.startsWith("http://"), regexp_replace(auth, ":80$", ""))
        .when(auth.startsWith("https://"), regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    // null input flows through (concat of a null is null); an empty
    // extract means "no scheme://authority prefix" -> not a URL
    when(auth === "", lit(null))
      .otherwise(concat(authNoPort, regexp_replace(path, "/+$", ""), query))
  }

  /** Host of a CANONICAL url (authority minus userinfo and port);
    * NULL when the authority is empty. */
  def urlHost(canonical: Column): Column = {
    val auth = regexp_extract(canonical, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    nullif(
      regexp_replace(regexp_replace(auth, "^.*@", ""), ":[0-9]+$", ""),
      lit(""))
  }

  /** Registered domain (eTLD+1) of a host: the last two labels, or the
    * last three when the last two are a known multi-part suffix
    * ([[multiPartSuffixes]]). IPv4 literals and single-label hosts
    * (`localhost`) pass through whole. Pure regexp — no array ops — so
    * the DuckDB oracle replays it verbatim. */
  def registeredDomain(host: Column): Column = {
    val isIp = host.rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$")
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(host.isNull, lit(null))
      .when(isIp, host)
      .when(last2 === "", host) // fewer than two labels
      .when(last3 =!= "" && last2.isin(multiPartSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** The composed convenience: registered domain straight from a raw URL
    * column (canonicalize → host → registered domain). */
  def urlDomain(url: Column): Column =
    registeredDomain(urlHost(canonicalizeUrl(url)))
}
