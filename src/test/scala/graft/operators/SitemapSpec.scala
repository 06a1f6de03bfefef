package graft.operators

import graft.SparkTestBase.spark
import graft.sources.Gen
import org.scalatest.funsuite.AnyFunSuite

/** c29 goldens: from_xml sitemap parsing must equal a hand-built mirror
  * of the synthetic catalog, stay total on hostile input, and feed the
  * ordinary seed path.
  */
class SitemapSpec extends AnyFunSuite {
  import spark.implicits._

  test("parsed entries == hand-built mirror (malformed hosts dropped)") {
    val got = SitemapOps.sitemapEntries(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDate(2).toString, r.getDouble(3)))
      .toSeq
    val want = (0 until Gen.NumHosts).filter(_ % 17 != 13).flatMap { i =>
      val host = Gen.hostName(i)
      (0 until (3 + i % 5)).map { j =>
        val day = 1 + (i * 7 + j) % 28
        val prio = (1 + (i + j) % 9) / 10.0
        (host, s"http://$host/news/sitemap/art-${i * 100 + j}",
          f"2026-01-$day%02d", prio)
      }
    }.sortBy(e => (e._1, e._2))
    assert(got == want)
    // the malformed plant actually exists at this catalog size — the
    // drop path is exercised, not vacuous
    assert((0 until Gen.NumHosts).exists(_ % 17 == 13))
  }

  test("hostile input totality: garbage, empty, loc-less entries") {
    val df = Seq(
      ("h1", "not xml at all"),
      ("h2", ""),
      ("h3", "<urlset></urlset>"),
      ("h4", "<urlset><url><lastmod>2026-01-01</lastmod></url></urlset>"),
      ("h5", "<urlset><url><loc>http://h5/ok</loc><lastmod>junk</lastmod>" +
        "<priority>0.5</priority></url></urlset>"))
      .toDF("host", "xml")
    val rows = SitemapOps.parseSitemaps(df).collect()
    // only h5 survives (loc present); its unparseable lastmod is null,
    // not an exception
    assert(rows.map(_.getString(0)).toSeq == Seq("h5"))
    assert(rows.head.isNullAt(2))
    assert(rows.head.getDouble(3) == 0.5)
  }

  test("pipeline with sitemaps=true schedules sitemap URLs; resume-safe") {
    val root = graft.SparkTestBase.tempDir("graft-sitemap-pipe")
    CrawlPipeline.run(spark, root, untilEpoch = 0, seedsPerEpoch = 300,
      cfg0 = FrontierJob.Config(), sitemaps = true)
    val sched = spark.read.parquet(s"$root/scheduled/epoch=0")
    val fromSitemap = sched.where(
      org.apache.spark.sql.functions.col("path").startsWith("/news/sitemap/"))
    assert(fromSitemap.count() > 0, "no sitemap URL was scheduled")
    // resume: re-invoking after the commit is a no-op (nothing re-runs)
    val again = CrawlPipeline.run(spark, root, untilEpoch = 0,
      seedsPerEpoch = 300, cfg0 = FrontierJob.Config(), sitemaps = true)
    assert(again.isEmpty, "committed epoch re-ran on resume")
  }

  test("sitemap seeds flow through the ordinary canonicalize path") {
    val entries = SitemapOps.sitemapEntries(spark)
    val frontier = FrontierJob.canonicalizeFrontier(SitemapOps.asSeeds(entries))
    // every synthetic sitemap URL is already canonical and unique -> the
    // frontier keeps them all, on the right hosts
    assert(frontier.count() == entries.count())
    val hosts = frontier.select("host").distinct()
      .collect().map(_.getString(0)).toSet
    val wantHosts = (0 until Gen.NumHosts).filter(_ % 17 != 13)
      .map(Gen.hostName).toSet
    assert(hosts == wantHosts)
  }

  // ---- c39: discovery from robots.txt --------------------------------

  test("robots Sitemap: lines parse globally; render round-trips them") {
    val txt = graft.functions.RobotsKit.render(
      Seq(graft.model.RobotsRule(allow = false, prefix = "/x")),
      Some(2000L), agent = "*",
      sitemaps = Seq("http://a.example.com/SiteMap.xml",
        "http://a.example.com/news.xml"))
    val p = graft.functions.RobotsKit.parse(txt, agent = "graftbot")
    // global: collected even though the '*' group is not graftbot-named
    assert(p.sitemaps == Seq("http://a.example.com/SiteMap.xml",
      "http://a.example.com/news.xml"))
    // URL case preserved (only directive KEYS are case-insensitive)
    assert(p.sitemaps.head.contains("SiteMap"))
    assert(graft.functions.RobotsKit.parse("").sitemaps.isEmpty)
  }

  test("c39 discovery == c29 entries restricted to advertising hosts") {
    val got = SitemapOps.discoveredEntries(spark).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val want = SitemapOps.sitemapEntries(spark).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter { case (h, _) =>
        val i = (0 until Gen.NumHosts).find(Gen.hostName(_) == h).get
        i % 11 != 3
      }.toSeq
    assert(got == want)
    // both plants non-vacuous: some host advertises nothing, some does
    assert((0 until Gen.NumHosts).exists(_ % 11 == 3))
    assert((0 until Gen.NumHosts).exists(i => i % 11 != 3 && i % 17 != 13))
  }

  test("c60 lastmod recrawl verdicts == per-row kernel mirror; all three statuses occur") {
    val entries = SitemapOps.discoveredEntries(spark)
    val verdicts = SitemapOps
      .lastmodRecrawl(entries, SitemapOps.syntheticLastFetch(entries))
      .select("url", "lastmod", "fetched_on", "status")
      .collect()
    assert(verdicts.nonEmpty)
    def pmodL(x: Long, m: Long): Long = ((x % m) + m) % m
    verdicts.foreach { r =>
      val url = r.getString(0)
      val lastmod = r.getDate(1).toLocalDate
      val fetchedOn = Option(r.getDate(2)).map(_.toLocalDate)
      // ledger membership + jitter mirror CrawlOracle.xxhash64 exactly
      val inLedger = pmodL(CrawlOracle.xxhash64(url), 3L) != 0L
      assert(fetchedOn.isDefined == inLedger, s"ledger($url)")
      fetchedOn.foreach { f =>
        val jitter = pmodL(CrawlOracle.xxhash64("f:" + url), 7L) - 3L
        assert(f == lastmod.plusDays(jitter), s"fetched_on($url)")
      }
      val want = fetchedOn match {
        case None => "new"
        case Some(f) if f.isBefore(lastmod) => "stale"
        case _ => "fresh"
      }
      assert(r.getString(3) == want, s"status($url)")
    }
    val byStatus = verdicts.groupBy(_.getString(3)).view.mapValues(_.length).toMap
    Seq("new", "stale", "fresh").foreach { s =>
      assert(byStatus.getOrElse(s, 0) > 0, s"status $s never occurs")
    }
  }
}
