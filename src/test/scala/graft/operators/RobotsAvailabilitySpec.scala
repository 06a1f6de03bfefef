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
}
