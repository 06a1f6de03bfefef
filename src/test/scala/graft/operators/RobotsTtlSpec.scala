package graft.operators

import graft.SparkTestBase.spark
import graft.sources.Gen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** c33 goldens: the freshness split must be disjoint and complete, held
  * rows must be exactly the stale hosts' rows, robots fetches exactly one
  * per stale host, and an all-fresh cache must be a no-op.
  */
class RobotsTtlSpec extends AnyFunSuite {
  import spark.implicits._

  private val epoch = 3
  private val ttl = 1

  private def robots() = Gen.robots(spark).toDF()
    .withColumn("fetched_epoch", pmod(xxhash64(col("host")), lit(4L)).cast("int"))
    .as[graft.model.RobotsEntry]

  test("split is disjoint + complete; held == stale hosts' rows exactly") {
    val frontier = FrontierJob.canonicalizeFrontier(Gen.seeds(spark, 2000))
      .localCheckpoint()
    val stale = RobotsTtlOps.staleHosts(robots(), epoch, ttl)
    val staleSet = stale.collect().map(_.getString(0)).toSet
    assert(staleSet.nonEmpty, "no stale host — plant vacuous")
    val (pass, held) = RobotsTtlOps.splitByRobotsFreshness(frontier, stale)
    val all = frontier.select("url_canon").collect().map(_.getString(0)).toSet
    val p = pass.select("url_canon").collect().map(_.getString(0)).toSet
    val h = held.select("url_canon").collect().map(_.getString(0)).toSet
    assert((p & h).isEmpty && (p | h) == all, "split not a partition")
    val wantHeld = frontier.collect()
      .filter(r => staleSet(r.getAs[String]("host")))
      .map(_.getAs[String]("url_canon")).toSet
    assert(h == wantHeld)
  }

  test("one top-priority robots fetch per stale host; fresh cache is a no-op") {
    val stale = RobotsTtlOps.staleHosts(robots(), epoch, ttl)
    val slots = RobotsTtlOps.robotsFetchSlots(stale, 0L).collect()
    val staleSet = stale.collect().map(_.getString(0)).toSet
    assert(slots.map(_.getString(0)).toSet == staleSet)
    assert(slots.length == staleSet.size)
    slots.foreach { s =>
      assert(s.getString(1) == s"http://${s.getString(0)}/robots.txt")
      assert(s.getDouble(2) == 1.0)
    }
    // all-fresh: TTL larger than any age -> nothing stale, nothing held
    val freshStale = RobotsTtlOps.staleHosts(robots(), epoch, ttlEpochs = 10)
    assert(freshStale.isEmpty)
    val frontier = FrontierJob.canonicalizeFrontier(Gen.seeds(spark, 500))
    val (pass, held) = RobotsTtlOps.splitByRobotsFreshness(frontier, freshStale)
    assert(held.isEmpty && pass.count() == frontier.count())
  }

  test("mirror: report ages/verdicts match the local robots catalog") {
    val got = RobotsTtlOps.ttlReport(spark).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getBoolean(2), r.getBoolean(5)))
      .toMap
    // spark-side hash column mirrored via a tiny DF roundtrip (xxhash64
    // has no public scala kernel here; the REPORT's own robots() is the
    // source of truth being checked for internal consistency)
    val ages = robots().collect().map(e => e.host -> (epoch - e.fetched_epoch)).toMap
    assert(got.keySet == ages.keySet)
    got.foreach { case (h, (age, stale, fetch)) =>
      assert(age == ages(h), s"$h age")
      assert(stale == (age > ttl), s"$h verdict")
      assert(fetch == stale, s"$h robots_fetch != stale")
    }
  }
}
