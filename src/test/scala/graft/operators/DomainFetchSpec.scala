package graft.operators

import graft.SparkTestBase.spark
import graft.functions.UrlKit
import org.scalatest.funsuite.AnyFunSuite

/** q55 registrable-domain extraction and c55 fetch validation: the pure
  * Column plans must equal their JVM kernels exactly.
  */
class DomainFetchSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("registrable domain kernel: PSL edge cases") {
    val cases = Seq(
      "www.news-site.co.uk" -> "news-site.co.uk",
      "img.cdn.news-site.co.uk" -> "news-site.co.uk",
      "example.com" -> "example.com",
      "a.b.c.example.com" -> "example.com",
      "co.uk" -> "co.uk", // bare public suffix: no registrable domain
      "com" -> "com",
      "host.weird.zz" -> "weird.zz", // unknown TLD: last-label fallback
      "zz" -> "zz",
      "sub.site7.com.au" -> "site7.com.au",
      "" -> "")
    cases.foreach { case (host, want) =>
      assert(UrlKit.registrableDomain(host) == want, s"kernel($host)")
    }
    assert(UrlKit.registrableDomain(null) == null)
    // the regex Column path must agree on every edge case too
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val viaCol = cases.map(_._1).toDF("host")
      .select(col("host"), DomainOps.registrableDomainCol(col("host")).as("dom"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (host, want) =>
      assert(viaCol(host) == want, s"column($host)")
    }
  }

  test("registrable domain column == kernel on the synthetic host set") {
    import org.apache.spark.sql.functions.col
    val rows = DomainOps.syntheticHosts(spark, dir)
      .select(col("host"), DomainOps.registrableDomainCol(col("host")).as("dom"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (host, dom) =>
      assert(dom == UrlKit.registrableDomain(host), s"column($host)")
    }
    // multi-label suffixes actually exercised
    assert(rows.exists(_._2.endsWith(".co.uk")))
    assert(rows.exists(_._2 == "co.uk"))
    assert(rows.exists(_._2 == "weird.zz"))
  }

  test("per-domain budget cap == kernel mirror; per-host schedule untouched below cap") {
    import org.apache.spark.sql.functions.{col, concat_ws, lit, pmod, xxhash64}
    // schedule-shaped rows: hosts spread over shared registrable domains
    val sched = spark.range(0, 3000)
      .select(
        xxhash64(col("id")).as("url_hash"),
        concat_ws(".",
          concat_ws("", lit("h"), pmod(col("id"), lit(40))),
          concat_ws("", lit("site"), pmod(col("id"), lit(7))),
          lit("co.uk")).as("host"),
        (pmod(xxhash64(col("id") + 1), lit(1000)) / lit(100.0)).as("priority"))
    val budget = 25
    val capped = FrontierJob.applyDomainBudget(sched, budget)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // mirror: group by kernel domain, sort (priority desc, hash asc), take N
    val all = sched.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val want = all.groupBy(t => UrlKit.registrableDomain(t._2))
      .valuesIterator
      .flatMap(rows => rows.sortBy(t => (-t._3, t._1)).take(budget))
      .toSet
    assert(capped.toSet == want)
    assert(capped.length == want.size)
    // the cap binds: 7 domains x 25 < 3000 input rows
    assert(capped.length == 7 * budget)
    // untouched columns survive the pass
    assert(capped.forall(t => t._2.endsWith(".co.uk")))
    // the c61 demo reports exactly min(before, budget) per domain
    val demo = DomainOps.domainBudgetDemo(spark, n = 3000L, budget = budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(demo.length == 7)
    demo.foreach { case (d, before, after) =>
      assert(after == math.min(before, budget.toLong), s"cap($d)")
    }
  }

  test("fetch validation column verdicts == JVM mirror; plants detected") {
    val n = 77
    val fetches = FetchAudit.plantedFetches(spark, n)
      .collect()
      .map(r => r.getString(0) -> ((r.getAs[Array[Byte]](1), r.getString(2))))
      .toMap
    val report = FetchAudit.validationReport(spark, n).collect()
    assert(report.length == n)
    report.foreach { r =>
      val id = r.getString(0)
      val (bytes, declared) = fetches(id)
      assert(declared == r.getString(1))
      val (sniffed, trailerOk, admit) = FetchAudit.mirrorVerdict(bytes, declared)
      assert(r.getString(2) == sniffed, s"sniffed($id)")
      assert(r.getBoolean(3) == trailerOk, s"trailer($id)")
      assert(r.getBoolean(4) == admit, s"admit($id)")
    }
    // every truncation plant is caught, every mislabel plant is caught,
    // every clean row admits
    report.foreach { r =>
      val i = r.getString(0).stripPrefix("img-").toInt
      if (i % 7 == 0) assert(!r.getBoolean(3), s"truncated img-$i not caught")
      else if (i % 11 == 0) assert(r.getString(1) != r.getString(2),
        s"mislabel img-$i not caught")
      else assert(r.getBoolean(4), s"clean img-$i rejected")
    }
    // summary counts are consistent with the per-row report
    val summary = FetchAudit.validationSummary(spark, n).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val byFmt = report.groupBy(_.getString(1))
    byFmt.foreach { case (fmt, rows) =>
      val (tot, mis, trunc, adm) = summary(fmt)
      assert(tot == rows.length)
      assert(mis == rows.count(r => r.getString(1) != r.getString(2)))
      assert(trunc == rows.count(r => !r.getBoolean(3)))
      assert(adm == rows.count(_.getBoolean(4)))
    }
  }
}
