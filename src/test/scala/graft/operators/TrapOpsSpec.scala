package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** c27 crawl-trap detection: features and host report vs a
  * single-threaded mirror, and the frontier action (suspect-host
  * anti-join) must drop exactly the suspect hosts' URLs.
  */
class TrapOpsSpec extends AnyFunSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** mirror of urlTrapFeatures over collected (host, url) rows */
  private def featuresLocal(rows: Seq[(String, String)]): Seq[(String, Boolean)] =
    rows.map { case (host, url) =>
      val pathQ = url.replaceFirst("^[a-z]+://[^/]+", "")
      val (path, query) = pathQ.split("\\?", 2) match {
        case Array(p, q) => (p, q)
        case Array(p)    => (p, "")
      }
      val segs = path.split("/").filter(_.nonEmpty)
      val nParams = if (query.nonEmpty) query.split("&").length else 0
      val isTrap = segs.length - segs.distinct.length >= 4 || nParams >= 2
      host -> isTrap
    }

  test("host trap report == single-threaded mirror; traps separate hosts") {
    val urls = TrapOps.syntheticUrls(spark, dir)
      .as[(String, String)].collect().toSeq
    val local = featuresLocal(urls)
      .groupBy(_._1).map { case (h, fs) =>
        val nTrap = fs.count(_._2).toLong
        (h, fs.size.toLong, nTrap, nTrap.toDouble / fs.size.toDouble,
          nTrap.toDouble / fs.size.toDouble >= 0.1)
      }.toSeq.sortBy(_._1)
    val got = TrapOps.trapHostReport(spark, dir)
      .as[(String, Long, Long, Double, Boolean)].collect().toSeq
    assert(got == local, "report != mirror")
    // the plant must produce BOTH kinds of host, or the verdict is vacuous
    assert(got.exists(_._5) && got.exists(!_._5),
      "trap plant failed to separate suspect from clean hosts")
    // clean hosts have zero traps (no false positives from clean URLs)
    assert(got.filter(!_._5).forall(_._3 == 0L),
      "a clean host accumulated trap URLs")
  }

  test("frontier action drops exactly the suspect hosts' URLs") {
    val report = TrapOps.trapHostReport(spark, dir)
    val suspects = report.where(col("trap_suspect"))
      .select("host").as[String].collect().toSet
    val frontier = TrapOps.syntheticUrls(spark, dir)
    val kept = TrapOps.filterTrapHosts(frontier, report)
      .as[(String, String)].collect()
    assert(kept.forall(r => !suspects(r._1)), "a suspect-host URL survived")
    val expected = frontier.as[(String, String)].collect()
      .count(r => !suspects(r._1))
    assert(kept.length == expected, "action dropped a clean-host URL")
  }
}
