package graft.operators

import graft.SparkTestBase.spark
import graft.model.RobotsRule
import graft.sources.Gen
import org.apache.spark.sql.functions.{broadcast, col}
import org.scalatest.funsuite.AnyFunSuite

/** c62 goldens (RFC 9309 unavailability semantics). Pinned: per-URL
  * effective verdicts == a JVM mirror (status/policy kernels +
  * CrawlOracle.robotsAllowed over the mirror's effective rule set)
  * EXACTLY; all four policies occur at the demo operating point; and the
  * three semantic laws hold per policy — 4xx admits everything, a fresh
  * 5xx admits nothing, ok/stale-5xx match the parsed rules.
  */
class RobotsAvailabilitySpec extends AnyFunSuite {
  private val epoch = 4
  private val staleEpochs = 1

  test("per-URL effective verdicts == kernel mirror; every policy occurs") {
    val robots = Gen.robotsLocal().map(r => r.host -> r.rules).toMap
    val frontier = FrontierJob.canonicalizeFrontier(Gen.seeds(spark, 4000))
    val rows = frontier
      .join(broadcast(Gen.robots(spark).toDF().select(col("host"), col("rules"))),
        Seq("host"))
      .withColumn("policy",
        RobotsAvailabilityOps.policyCol(col("host"), epoch, staleEpochs))
      .select(col("host"), col("path"), col("policy"),
        FrontierJob.robotsAllowedCol(
          RobotsAvailabilityOps.effectiveRulesCol(col("rules"), col("policy")),
          col("path")).as("eff_ok"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (host, path, policy, effOk) =
        (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3))
      val wantPolicy = RobotsAvailabilityOps.policyLocal(host, epoch, staleEpochs)
      assert(policy == wantPolicy, s"policy diverges for $host")
      val effRules: Seq[RobotsRule] = wantPolicy match {
        case "allow_all_unavailable"    => Seq.empty
        case "disallow_all_unreachable" => Seq(RobotsRule(allow = false, prefix = ""))
        case _                          => robots(host)
      }
      assert(effOk == CrawlOracle.robotsAllowed(effRules, path),
        s"verdict diverges for $host$path under $wantPolicy")
    }
    val seen = rows.map(_.getString(2)).toSet
    assert(seen == Set("ok", "allow_all_unavailable",
      "disallow_all_unreachable", "cached_stale_error"),
      s"policies realized: $seen")
  }

  test("policy laws: 4xx admits all, fresh 5xx admits none, ok/stale-5xx == parsed") {
    val rep = RobotsAvailabilityOps.availabilityReport(spark, epoch, staleEpochs)
      .collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val (policy, n, eff, parsed) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      policy match {
        case "allow_all_unavailable"    => assert(eff == n)
        case "disallow_all_unreachable" => assert(eff == 0L)
        case _                          => assert(eff == parsed)
      }
    }
    // the semantics bite non-vacuously: some 4xx host gains rows over its
    // parsed rules, some fresh-5xx host loses rows it would have crawled
    assert(rep.exists(r => r.getString(1) == "allow_all_unavailable" &&
      r.getLong(3) > r.getLong(4)))
    assert(rep.exists(r => r.getString(1) == "disallow_all_unreachable" &&
      r.getLong(4) > 0L))
  }

  test("an odd epoch flips transient hosts back to ok; chronic hosts stay on the cache") {
    val hosts = Gen.robotsLocal().map(_.host)
    val chronic = hosts.filter(h => RobotsAvailabilityOps.hostClassLocal(h) == 0L)
    val transient = hosts.filter(h => RobotsAvailabilityOps.hostClassLocal(h) == 2L)
    assert(chronic.nonEmpty && transient.nonEmpty)
    transient.foreach { h =>
      assert(RobotsAvailabilityOps.policyLocal(h, 4, 1) == "disallow_all_unreachable")
      assert(RobotsAvailabilityOps.policyLocal(h, 5, 1) == "ok")
    }
    chronic.foreach { h =>
      assert(RobotsAvailabilityOps.policyLocal(h, 4, 1) == "cached_stale_error")
      assert(RobotsAvailabilityOps.policyLocal(h, 5, 1) == "cached_stale_error")
    }
  }

  test("pipeline robotsAvailability: fresh-5xx hosts park, 4xx hosts open, others schedule identically to control") {
    val on = graft.SparkTestBase.tempDir("graft-avail-on")
    val off = graft.SparkTestBase.tempDir("graft-avail-off")
    val cfg = FrontierJob.Config(epoch = 0, globalBudget = 100000)
    CrawlPipeline.run(spark, on, untilEpoch = 0, seedsPerEpoch = 2000,
      cfg0 = cfg, robotsAvailability = true)
    CrawlPipeline.run(spark, off, untilEpoch = 0, seedsPerEpoch = 2000, cfg0 = cfg)
    val cls = Gen.robotsLocal()
      .map(r => r.host -> RobotsAvailabilityOps.hostClassLocal(r.host)).toMap
    def sched(root: String): Array[(String, Long, String)] =
      spark.read.parquet(s"$root/scheduled/epoch=0")
        .select("host", "url_hash", "path").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val onRows = sched(on)
    val offRows = sched(off)
    // epoch 0 is even and has no error streak behind it: transient (class
    // 2) hosts are freshly unreachable — complete disallow, nothing lands
    assert(onRows.forall(r => cls(r._1) != 2L))
    assert(offRows.exists(r => cls(r._1) == 2L), "control never exercised a transient host")
    // a 4xx host schedules at least one path its PARSED rules disallow
    val parsed = Gen.robotsLocal().map(r => r.host -> r.rules).toMap
    assert(onRows.exists(r => cls(r._1) == 1L &&
      !CrawlOracle.robotsAllowed(parsed(r._1), r._3)))
    assert(offRows.forall(r => CrawlOracle.robotsAllowed(parsed(r._1), r._3)))
    // healthy and chronic (cached-copy) hosts schedule the exact same URLs
    def byHost(rows: Array[(String, Long, String)]): Map[String, Set[Long]] =
      rows.filter(r => cls(r._1) != 1L && cls(r._1) != 2L)
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byHost(onRows) == byHost(offRows))
  }
}
