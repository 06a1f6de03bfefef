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
}
