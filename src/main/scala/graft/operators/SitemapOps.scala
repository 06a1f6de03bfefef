package graft.operators

import graft.model.Seed
import graft.sources.Gen
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Sitemap ingestion (c29) — the discovery channel every production
  * crawler reads BESIDE outlinks: hosts publish `sitemap.xml` (urlset of
  * loc/lastmod/priority entries, sitemaps.org protocol), and a frontier
  * that ignores it re-discovers the long tail one link hop at a time.
  *
  * Spark-first shape: the XML never leaves the executor that fetched it —
  * `from_xml` (native, codegen-adjacent, Spark 4) parses the document
  * into a typed array column, one explode lifts entries to URL rows, and
  * the result unions into the same canonicalize -> dedupe -> politeness
  * path as every other seed (no separate ingestion pipeline). Malformed
  * documents parse to NULL and are dropped — a broken sitemap must cost
  * its own entries, never the wave (PERMISSIVE-mode discipline).
  *
  * No DuckDB oracle (no XML functions there); gate = SitemapSpec goldens
  * vs hand-built expected rows + totality on hostile input.
  */
object SitemapOps {

  /** sitemaps.org-shaped urlset schema: `<url>` repeats, so it parses as
    * an array of structs; `lastmod` stays a string here and casts to date
    * after parse (W3C datetime allows several shapes).
    */
  val urlsetSchema: StructType = StructType(Seq(
    StructField("url", ArrayType(StructType(Seq(
      StructField("loc", StringType),
      StructField("lastmod", StringType),
      StructField("priority", DoubleType)))))))

  /** Deterministic per-host sitemap documents over the Gen host catalog:
    * host i publishes `3 + i % 5` entries with a lastmod day and priority
    * derived from (host, entry) — every value reconstructible by the
    * spec's mirror. Every 17th host publishes GARBAGE (truncated XML) so
    * the malformed-document path is always exercised.
    */
  def syntheticSitemaps(spark: SparkSession, nHosts: Int = Gen.NumHosts): DataFrame = {
    import spark.implicits._
    (0 until nHosts).map { i =>
      val host = Gen.hostName(i)
      val xml =
        if (i % 17 == 13) s"<urlset><url><loc>http://$host/broken"
        else {
          val entries = (0 until (3 + i % 5)).map { j =>
            val day = 1 + (i * 7 + j) % 28
            val prio = (1 + (i + j) % 9) / 10.0
            s"<url><loc>http://$host/news/sitemap/art-${i * 100 + j}</loc>" +
              f"<lastmod>2026-01-$day%02d</lastmod><priority>$prio%.1f</priority></url>"
          }.mkString
          s"<urlset>$entries</urlset>"
        }
      (host, xml)
    }.toDF("host", "xml")
  }

  /** Parse (host, xml) sitemap documents into typed URL rows; malformed
    * XML yields a NULL struct and is filtered out here.
    */
  def parseSitemaps(sitemaps: DataFrame): DataFrame =
    sitemaps
      .select(col("host"),
        from_xml(col("xml"), urlsetSchema,
          java.util.Map.of("mode", "PERMISSIVE")).as("parsed"))
      .where(col("parsed").isNotNull && col("parsed.url").isNotNull)
      .select(col("host"), explode(col("parsed.url")).as("entry"))
      .select(col("host"),
        col("entry.loc").as("url"),
        // try_to_date: ANSI mode throws on a malformed lastmod otherwise —
        // one sloppy site must cost its field, not the wave
        try_to_date(col("entry.lastmod"), "yyyy-MM-dd").as("lastmod"),
        col("entry.priority").as("priority"))
      .where(col("url").isNotNull)

  /** c29 — the driver-facing query: parsed sitemap entries, date-typed,
    * deterministic order.
    */
  def sitemapEntries(spark: SparkSession): DataFrame =
    parseSitemaps(syntheticSitemaps(spark)).orderBy("host", "url")

  /** Merge sitemap discoveries into the frontier seed stream: sitemap
    * priority IS the seed priority (the protocol's semantics), and the
    * union feeds the same canonicalize/dedupe path as ordinary seeds.
    */
  def asSeeds(entries: DataFrame): Dataset[Seed] = {
    import entries.sparkSession.implicits._
    entries.select(col("url"), col("priority")).as[Seed]
  }

  // ---- c39: sitemap DISCOVERY from robots.txt --------------------------
  //
  // sitemaps.org's discovery mechanism: hosts advertise their sitemap
  // with a global `Sitemap:` line in robots.txt. The crawl already
  // fetches robots.txt for the politeness gate, so discovery is FREE —
  // the same fetched text yields the sitemap URL list, and only
  // advertised sitemaps are fetched (a crawler must not guess URLs).

  /** Deterministic robots.txt texts over the host catalog: every host
    * carries one Disallow rule and a crawl delay; every 11th host (i%11
    * == 3) advertises NO sitemap — discovery must not fabricate one.
    */
  def syntheticRobotsWithSitemaps(spark: SparkSession,
                                  nHosts: Int = Gen.NumHosts): DataFrame = {
    import spark.implicits._
    (0 until nHosts).map { i =>
      val host = Gen.hostName(i)
      val sitemaps =
        if (i % 11 == 3) Seq.empty[String]
        else Seq(s"http://$host/sitemap.xml")
      (host, graft.functions.RobotsKit.render(
        Seq(graft.model.RobotsRule(allow = false, prefix = s"/private$i")),
        Some(1000L + 100L * (i % 5)), agent = "*", sitemaps = sitemaps))
    }.toDF("host", "robots_txt")
  }

  /** Extract advertised sitemap URLs from fetched robots.txt text —
    * executor-side kernel parse, (host, url) rows out.
    */
  def discoverFromRobots(robotsTexts: DataFrame): DataFrame = {
    import robotsTexts.sparkSession.implicits._
    robotsTexts.select("host", "robots_txt").as[(String, String)]
      .flatMap { case (h, txt) =>
        graft.functions.RobotsKit.parse(txt).sitemaps.map(u => (h, u))
      }
      .toDF("host", "sitemap_url")
  }

  /** c39 — the discovery chain end to end: robots.txt -> advertised
    * sitemap URLs -> fetch (the synthetic per-host document stands in) ->
    * parsed, typed entries. Hosts that advertise nothing contribute
    * nothing, whatever they publish.
    */
  def discoveredEntries(spark: SparkSession,
                        nHosts: Int = Gen.NumHosts): DataFrame = {
    val advertised = discoverFromRobots(
      syntheticRobotsWithSitemaps(spark, nHosts))
    parseSitemaps(
      advertised.join(syntheticSitemaps(spark, nHosts), Seq("host")))
      .orderBy("host", "url")
  }

  // ---- c60: lastmod-driven recrawl -------------------------------------

  /** Synthetic last-fetch ledger over the sitemap URL space: ~2/3 of
    * entries were fetched, on a day xxhash64-jittered +-3 around their
    * lastmod — so "fetched after lastmod" (fresh), "fetched before"
    * (stale) and "never fetched" (new) all occur. Deterministic; the
    * spec's mirror recomputes it from CrawlOracle.xxhash64.
    */
  def syntheticLastFetch(entries: DataFrame): DataFrame =
    entries
      .where(pmod(xxhash64(col("url")), lit(3)) =!= 0)
      .select(col("url"),
        date_add(col("lastmod"),
          (pmod(xxhash64(concat(lit("f:"), col("url"))), lit(7)) - 3).cast("int"))
          .as("fetched_on"))

  /** c60 — lastmod-driven recrawl verdicts: the sitemaps.org PUSH signal
    * (c45 learns change rates from observed flips, c51 revalidates with
    * conditional GETs — lastmod is the third leg: the host TELLS us what
    * changed). status = new (never fetched) | stale (lastmod newer than
    * our fetch -> due) | fresh. Scale shape: the sitemap table is slim
    * (url, date, double) and joins the fetch ledger once on url
    * (sort-merge on the key both sides are naturally stored by); verdicts
    * are a codegen CASE — no payload, no second pass.
    */
  def lastmodRecrawl(entries: DataFrame, lastFetch: DataFrame): DataFrame =
    entries.join(lastFetch, Seq("url"), "left")
      .withColumn("status",
        when(col("fetched_on").isNull, "new")
          .when(col("fetched_on") < col("lastmod"), "stale")
          .otherwise("fresh"))

  /** Driver-facing c60 rows: per-host status counts over the discovered
    * (robots-advertised) sitemap entries.
    */
  def lastmodRecrawlDemo(spark: SparkSession): DataFrame = {
    val entries = discoveredEntries(spark)
    lastmodRecrawl(entries, syntheticLastFetch(entries))
      .groupBy("host")
      .agg(count(lit(1)).cast("long").as("n_entries"),
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("status") === "stale", 1L).otherwise(0L)).as("n_stale"),
        sum(when(col("status") === "fresh", 1L).otherwise(0L)).as("n_fresh"))
      .orderBy("host")
  }
}
