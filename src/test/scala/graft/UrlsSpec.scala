package graft

import org.apache.spark.sql.functions._
import graft.functions.Urls
import graft.operators.Curation

class UrlsSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(s: String): String = {
    val r = Seq(Tuple1(s)).toDF("u")
      .select(Urls.canonicalizeUrl(col("u"))).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }
  private def dom(s: String): String = {
    val r = Seq(Tuple1(s)).toDF("u")
      .select(Urls.urlDomain(col("u"))).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("canonicalizeUrl: each policy rule, one at a time") {
    // scheme+authority lowercased; path/query case preserved
    assert(canon("HTTPS://WWW.Example.COM/Path?Q=Mixed") ===
      "https://www.example.com/Path?Q=Mixed")
    // fragment stripped
    assert(canon("http://a.com/x#Frag") === "http://a.com/x")
    // default ports stripped, non-default kept
    assert(canon("http://a.com:80/x") === "http://a.com/x")
    assert(canon("https://a.com:443/x") === "https://a.com/x")
    assert(canon("https://a.com:80/x") === "https://a.com:80/x")
    assert(canon("http://a.com:8080/x") === "http://a.com:8080/x")
    // trailing slashes stripped uniformly, root included
    assert(canon("https://a.com/") === "https://a.com")
    assert(canon("https://a.com/x///") === "https://a.com/x")
    // trailing slash before a query also goes; query survives
    assert(canon("https://a.com/x/?q=1") === "https://a.com/x?q=1")
    // surrounding whitespace trimmed
    assert(canon("  https://a.com/x ") === "https://a.com/x")
    // non-URLs (no scheme://authority) -> null
    assert(canon("not a url") === null)
    assert(canon("example.com/path") === null)
    assert(canon("mailto:a@b.com") === null)
    // null in -> null out
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("u")
      .select(Urls.canonicalizeUrl(col("u"))).head()
    assert(n.isNullAt(0))
  }

  test("urlHost strips userinfo and port; registeredDomain handles " +
    "multi-part suffixes, IPv4 literals, and single labels") {
    val h = Seq(Tuple1("https://user:pw@Sub.Example.co.UK:8443/p?x=1"))
      .toDF("u")
      .select(Urls.urlHost(Urls.canonicalizeUrl(col("u")))).head().getString(0)
    assert(h === "sub.example.co.uk")
    assert(dom("https://blog.news.example.com/x") === "example.com")
    assert(dom("https://a.b.example.co.uk/") === "example.co.uk")
    assert(dom("http://cdn.assets.shop.com.au") === "shop.com.au")
    assert(dom("http://example.com") === "example.com")
    assert(dom("http://192.168.0.1:8080/admin") === "192.168.0.1")
    assert(dom("http://localhost:3000/x") === "localhost")
    assert(dom("garbage") === null)
  }

  test("domainGate: blocklist matches by REGISTERED domain (subdomains " +
    "included), per-domain cap is the deterministic md5-rank prefix, " +
    "unparseable URLs are quarantined") {
    val docs = Seq(
      (1L, "https://a.example.org/1"),   // blocked via registered domain
      (2L, "http://example.org/2"),      // blocked
      (3L, "https://keep.com/a"),
      (4L, "https://keep.com/b"),
      (5L, "https://keep.com/c"),
      (6L, "https://other.net/x"),
      (7L, "not a url")                  // null domain -> dropped
    ).toDF("doc_id", "url")
    val out = Curation.domainGate(docs, col("url"), col("doc_id"),
        maxPerDomain = 2, blocklist = Seq("example.org"))
      .select("doc_id", "domain").as[(Long, String)].collect().toSet
    assert(!out.exists(_._2 == "example.org"))
    assert(!out.exists(_._1 == 7L))
    assert(out.count(_._2 == "keep.com") === 2)
    assert(out.exists(_._1 == 6L))
    // the two keep.com survivors are the md5-rank prefix — replay it
    val expectKeep = Seq(3L, 4L, 5L)
      .sortBy(i => (java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, i))
      .take(2).toSet
    assert(out.filter(_._2 == "keep.com").map(_._1) === expectKeep)
    // guard: a non-positive cap is refused loudly
    intercept[IllegalArgumentException] {
      Curation.domainGate(docs, col("url"), col("doc_id"), 0)
    }
  }

  test("domainGate plans the cap as WindowGroupLimit (partial top-k: the " +
    "hot domain never converges on one task)") {
    val docs = (1L to 200L).map(i => (i, s"https://hot.com/$i"))
      .toDF("doc_id", "url")
    val plan = Curation.domainGate(docs, col("url"), col("doc_id"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("domainGate's layered domain build equals the composed " +
    "Urls.urlDomain AND the plan evaluates the canonicalize chain once " +
    "(r12: the inlined composition re-ran ~20 regexps per reference)") {
    val docs = (1L to 50L).map { i =>
      val url = i % 7 match {
        case 0 => s"  HTTPS://User@Sub$i.Example.ORG:443/p/$i/?q=X#f"
        case 1 => "not a url"
        case 2 => s"http://shop$i.co.uk:80/a//"
        case 3 => s"http://10.0.0.$i/raw"
        case 4 => s"ftp://files.site$i.com:21/x"
        case 5 => s"https://localhost/$i"
        case _ => s"https://www.site$i.com/path/$i?a=B#frag"
      }
      (i, url)
    }.toDF("doc_id", "url")
    val gated = Curation.domainGate(docs, col("url"), col("doc_id"),
      maxPerDomain = 1000)
    val viaGate = gated.select("doc_id", "domain")
      .as[(Long, String)].collect().toMap
    val composed = docs.select(col("doc_id"),
        Urls.urlDomain(col("url")).as("domain"))
      .where(col("domain").isNotNull)
      .as[(Long, String)].collect().toMap
    assert(viaGate === composed)
    // one evaluation of the chain: the canonicalize step's trim appears in
    // the executed plan a bounded number of times (projection + nothing
    // else), not once per downstream reference as the composed form inlined
    val plan = gated.queryExecution.executedPlan.toString
    val trims = "trim\\(".r.findAllIn(plan).size
    assert(trims <= 4, s"canonicalize chain inlined $trims times:\n" +
      plan.take(3000))
  }

  test("domainGate refuses inputs already carrying its output columns " +
    "instead of silently clobbering caller data") {
    val withDomain = Seq((1L, "https://a.com/x", "label"))
      .toDF("doc_id", "url", "domain")
    val e = intercept[IllegalArgumentException] {
      Curation.domainGate(withDomain, col("url"), col("doc_id"), 5)
    }
    assert(e.getMessage.contains("already has a 'domain' column"))
    val withRk = Seq((1L, "https://a.com/x", 7))
      .toDF("doc_id", "url", "__rk")
    intercept[IllegalArgumentException] {
      Curation.domainGate(withRk, col("url"), col("doc_id"), 5)
    }
  }
}
