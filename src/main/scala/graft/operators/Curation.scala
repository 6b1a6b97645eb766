package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Urls

/** Domain-level corpus gating — the standard pretraining curation stage
  * between URL derivation and text filtering (the C4 / RefinedWeb /
  * FineWeb shape): drop blocklisted registered domains, then cap how many
  * documents any single domain may contribute, so one crawl-friendly host
  * cannot dominate the training mixture.
  *
  * Scale posture (the lang-ntile lesson applies — one domain IS the hot
  * key): the cap is a `row_number() <= k` partial top-k, which Spark
  * plans as WindowGroupLimit — each input partition ships at most k rows
  * per domain into the shuffle, so the hot domain's population never
  * converges on one task. The blocklist is a broadcast anti-join
  * (blocklists are small by construction — thousands of names, not
  * millions). No other shuffle exists in the gate.
  */
object Curation {

  /** Keep at most `maxPerDomain` documents per registered domain, after
    * dropping `blocklist`ed domains and rows whose URL does not
    * canonicalize (null domain = unparseable URL = quarantined, the C4
    * policy). Survivor choice is deterministic and unbiased: the md5-rank
    * prefix within each domain (the same engine-reproducible uniform draw
    * as `Mixture.temperatureSample`), id as tiebreak.
    *
    * Output = input columns + `domain` (the registered domain that was
    * gated on). Blocklist entries are matched against REGISTERED domains
    * (`example.org` blocks `a.example.org` too — that is the point of
    * extracting eTLD+1 first).
    */
  def domainGate(docs: DataFrame, url: Column, id: Column,
                 maxPerDomain: Int,
                 blocklist: Seq[String] = Seq.empty): DataFrame = {
    require(maxPerDomain > 0, s"domainGate: maxPerDomain=$maxPerDomain")
    // fail loudly instead of silently clobbering caller data: the output
    // contract is "input columns + domain", which is unsatisfiable if the
    // input already carries one of the gate's columns
    Seq("domain", "__rk", "__url_canon", "__url_host").foreach(c =>
      require(!docs.columns.contains(c),
        s"domainGate: input already has a '$c' column — rename it " +
          "upstream; the gate adds its own"))
    val spark = docs.sparkSession
    import spark.implicits._
    // LAYERED projections + a ComputeOnce barrier, not the composed
    // Urls.urlDomain: the one-expression composition re-inlines the full
    // canonicalize chain at every internal reference (registeredDomain
    // alone reads its host argument 6 times), and the isNotNull predicate
    // below would be pushed down with the whole subtree substituted —
    // measured 8.3 s warm / 16.3 s cold at sf0.1 for the inlined plan vs
    // ~0.4 s for this shape (OPTIMIZATION_r12.md, guide §4.4). Each stage
    // evaluates once per row; ComputeOnce pins the final alias so neither
    // CollapseProject nor predicate pushdown can duplicate the chain.
    val withDom = docs
      .withColumn("__url_canon", Urls.canonicalizeUrl(url))
      .withColumn("__url_host", Urls.urlHost(col("__url_canon")))
      .withColumn("domain",
        graft.functions.ComputeOnce.once(
          Urls.registeredDomain(col("__url_host"))))
      .drop("__url_canon", "__url_host")
      .where(col("domain").isNotNull)
    val kept =
      if (blocklist.isEmpty) withDom
      else withDom.join(
        broadcast(blocklist.toDF("domain")), Seq("domain"), "left_anti")
    val w = Window.partitionBy(col("domain"))
      .orderBy(md5(id.cast("string")), id)
    kept.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= maxPerDomain)
      .drop("__rk")
  }
}
