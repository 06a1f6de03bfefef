package graft.operators

import graft.functions.UrlKit
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Registrable-domain (eTLD+1) extraction and the per-domain crawl rollup.
  *
  * Production politeness/budget policy groups by REGISTRABLE domain, not raw
  * host — `img.cdn.news-site.co.uk` and `www.news-site.co.uk` share one
  * crawl budget (publicsuffix.org semantics; the embedded snapshot subset
  * lives in UrlKit.PublicSuffixes). The extraction is a pure Column
  * composition (a when() longest-suffix chain + split/slice label
  * arithmetic) — whole-stage-codegen'd, no UDF, so the frontier can group
  * on it at scan speed; the JVM kernel (UrlKit.registrableDomain) is the
  * mirror the column is golden-gated against, and the q55 oracle
  * re-implements the longest-match in DuckDB CASE/list SQL independently.
  */
object DomainOps {

  /** eTLD+1 as a pure Column over a host column.
    *
    * One end-anchored regex realizes longest-suffix-match: a match must
    * consume the ENTIRE remainder `label.suffix$`, so the leftmost (=
    * most-label) position where any snapshot suffix completes the host
    * wins — exactly the kernel's longest-match (a bare 2-label suffix
    * like `co.uk` self-matches as `co`+`.uk`, which equals the kernel's
    * return-itself rule). Unknown TLDs fall back to the last-2-label
    * regex; single-label hosts fall through to the host itself. A compact
    * 2-regex expression instead of a 23-deep when()/coalesce chain — the
    * chain's generated code blew past JIT-friendly size and cost ~20s of
    * codegen/interpretation in the bench (measured; see BENCH notes).
    */
  def registrableDomainCol(host: Column): Column = {
    val alts = UrlKit.PublicSuffixes
      .sortBy(s => (-s.count(_ == '.'), -s.length))
      .map(_.replace(".", "\\."))
      .mkString("|")
    val psl = regexp_extract(host, s"(?:^|\\.)([^.]+\\.(?:$alts))$$", 1)
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    coalesce(nullif(psl, lit("")), nullif(last2, lit("")), host)
  }

  /** Deterministic host synthesis from doc_id (the c27 URL-synthesis
    * discipline — both engines rebuild the identical host set from the
    * documents table): subdomain x name x suffix, plus a bare-public-suffix
    * edge row per 50th doc and an unknown-TLD family at doc_id%7==6.
    */
  private[operators] def syntheticHosts(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
    val sub = when(col("doc_id") % 4 === 0, lit("www."))
      .when(col("doc_id") % 4 === 1, lit("img."))
      .otherwise(lit(""))
    val suffix = when(col("doc_id") % 7 === 0, lit("com"))
      .when(col("doc_id") % 7 === 1, lit("org"))
      .when(col("doc_id") % 7 === 2, lit("net"))
      .when(col("doc_id") % 7 === 3, lit("co.uk"))
      .when(col("doc_id") % 7 === 4, lit("com.au"))
      .when(col("doc_id") % 7 === 5, lit("co.jp"))
      .otherwise(lit("weird.zz"))
    val base = docs.select(col("doc_id"),
      concat(sub, lit("site"), col("doc_id") % 97, lit("."), suffix).as("host"))
    val bare = docs.where(col("doc_id") % 50 === 0)
      .select(col("doc_id"), lit("co.uk").as("host"))
    base.unionByName(bare)
  }

  /** q55 — per-registrable-domain crawl rollup: URL count and distinct
    * hosts (the shape a per-domain budget allocator consumes; swap
    * FrontierJob's politeness group key to this column and the rest of the
    * pipeline composes unchanged).
    */
  def domainRollup(spark: SparkSession, dir: String): DataFrame =
    syntheticHosts(spark, dir)
      .select(col("host"), registrableDomainCol(col("host")).as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("host")).as("n_hosts"))
      .orderBy("domain")

  /** c61 — the per-domain cap in action (FrontierJob.applyDomainBudget,
    * mirror-golden in DomainFetchSpec): a 40-host/7-domain schedule-shaped
    * table, before/after row counts per domain — every domain lands
    * exactly at min(before, budget).
    */
  def domainBudgetDemo(spark: SparkSession, n: Long = 30000L,
                       budget: Int = 25): DataFrame = {
    val sched = spark.range(0, n).select(
      xxhash64(col("id")).as("url_hash"),
      concat_ws(".",
        concat(lit("h"), pmod(col("id"), lit(40)).cast("string")),
        concat(lit("site"), pmod(col("id"), lit(7)).cast("string")),
        lit("co.uk")).as("host"),
      (pmod(xxhash64(col("id") + 1), lit(1000)) / lit(100.0)).as("priority"))
    val domain = registrableDomainCol(col("host")).as("domain")
    sched.groupBy(domain).agg(count(lit(1)).cast("long").as("n_before"))
      .join(
        FrontierJob.applyDomainBudget(sched, budget)
          .groupBy(domain).agg(count(lit(1)).cast("long").as("n_capped")),
        Seq("domain"))
      .orderBy("domain")
  }
}
