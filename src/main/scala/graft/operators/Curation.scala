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
    Seq("domain", "__rk").foreach(c =>
      require(!docs.columns.contains(c),
        s"domainGate: input already has a '$c' column — rename it " +
          "upstream; the gate adds its own"))
    val spark = docs.sparkSession
    import spark.implicits._
    val withDom = docs
      .withColumn("domain", Urls.urlDomain(url))
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
