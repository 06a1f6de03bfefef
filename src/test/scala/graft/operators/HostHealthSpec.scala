package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** c85 host-health ledger: the fetch-outcome side must equal counts
  * PREDICTED from the committed schedules + the fetch kernels (a true
  * cross-check between two committed artifacts — schedule vs fetch log),
  * and the revision side must agree with the revisions tables.
  */
class HostHealthSpec extends AnyFunSuite {

  test("ledger == schedule+kernel prediction; revision side == revisions tables") {
    val root = graft.SparkTestBase.tempDir("graft-health")
    val epochs = 2
    CrawlPipeline.run(spark, root, untilEpoch = epochs, seedsPerEpoch = 400,
      cfg0 = FrontierJob.Config(epoch = 0, globalBudget = 10000),
      recrawl = true)

    // predict fetch outcomes per host from the schedules + kernels
    val predicted = scala.collection.mutable.Map
      .empty[String, (Long, Long, Long, Long)] // fetched, parsed, ffail, pfail
    (0 to epochs).foreach { e =>
      spark.read.parquet(s"$root/scheduled/epoch=$e")
        .select("url_canon", "url_hash").collect().foreach { r =>
          val host = graft.functions.UrlKit.hostOf(r.getString(0))
          val h = r.getLong(1)
          val (f, p, ff, pf) = predicted.getOrElse(host, (0L, 0L, 0L, 0L))
          val row =
            if (CrawlPipeline.fetchFails(h, e)) (f + 1, p, ff + 1, pf)
            else if (CrawlPipeline.parseFails(h, e)) (f + 1, p, ff, pf + 1)
            else (f + 1, p + 1, ff, pf)
          predicted(host) = row
        }
    }
    val revCounts = (0 to epochs).flatMap { e =>
      spark.read.parquet(s"$root/revisions/epoch=$e")
        .where(org.apache.spark.sql.functions.col("change").startsWith("revised"))
        .select("image_id").collect()
        .map(r => graft.functions.UrlKit.hostOf(r.getString(0)))
    }.groupBy(identity).map { case (h, v) => h -> v.length.toLong }

    val got = HealthOps.hostHealth(spark, root, epochs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap

    assert(got.keySet == predicted.keySet)
    got.foreach { case (host, (f, p, ff, pf, rev, fbp, rbp)) =>
      val (ef, ep, eff, epf) = predicted(host)
      assert((f, p, ff, pf) == ((ef, ep, eff, epf)),
        s"fetch ledger drift for $host")
      assert(rev == revCounts.getOrElse(host, 0L), s"revision drift for $host")
      assert(fbp == (ff + pf) * 10000L / f)
      assert(rbp == (if (p == 0) 0L else rev * 10000L / p))
    }
    // non-vacuity: the kernels realize failures and the crawl revisions
    assert(got.values.exists(v => v._3 > 0), "no transport failures planted")
    assert(got.values.exists(v => v._5 > 0), "no revisions realized")
  }

  test("c88 priority calibration == plain-Scala Spearman over the same committed tables") {
    val root = graft.SparkTestBase.tempDir("graft-calib")
    val epochs = 2
    CrawlPipeline.run(spark, root, untilEpoch = epochs, seedsPerEpoch = 400,
      cfg0 = FrontierJob.Config(epoch = 0, globalBudget = 10000),
      recrawl = true)

    // mirror: spent (quantized priority sums) and revision yield per host
    val spent = scala.collection.mutable.Map.empty[String, Long]
    (0 to epochs).foreach { e =>
      spark.read.parquet(s"$root/scheduled/epoch=$e")
        .select("host", "priority").collect().foreach { r =>
          val q = math.round(r.getDouble(1) * 1e6)
          spent(r.getString(0)) = spent.getOrElse(r.getString(0), 0L) + q
        }
    }
    val got = (0 to epochs).flatMap { e =>
      spark.read.parquet(s"$root/revisions/epoch=$e")
        .where(org.apache.spark.sql.functions.col("change").startsWith("revised"))
        .select("image_id").collect()
        .map(r => graft.functions.UrlKit.hostOf(r.getString(0)))
    }.groupBy(identity).map { case (h, v) => h -> v.length.toLong }
    val hosts = spent.keys.toSeq.sorted
    def ranks(v: String => Long): Map[String, Long] =
      hosts.sortBy(h => (-v(h), h)).zipWithIndex
        .map { case (h, i) => h -> (i + 1L) }.toMap
    val rx = ranks(spent)
    val ry = ranks(h => got.getOrElse(h, 0L))
    val n = hosts.length.toLong
    val sumD2 = hosts.map(h => { val d = rx(h) - ry(h); d * d }).sum
    val expRho = BigDecimal(1.0 - 6.0 * sumD2.toDouble / (n * n * n - n).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    val row = HealthOps.priorityCalibration(spark, root, epochs).collect()
    assert(row.length == 1)
    assert(row(0).getLong(0) == n, "host count drift")
    assert(row(0).getLong(1) == sumD2, s"sum_d2 drift: ${row(0).getLong(1)} vs $sumD2")
    assert(row(0).getDouble(2) == expRho, s"rho drift: ${row(0).getDouble(2)} vs $expRho")
    // non-vacuity: the statistic is not pinned at a degenerate extreme
    assert(n >= 10, "too few hosts for a meaningful calibration fixture")
    assert(sumD2 > 0L, "rank vectors identical — vacuous fixture")
  }
}
