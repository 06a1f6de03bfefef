package graft.operators

import graft.SparkTestBase.spark
import graft.sources.Gen
import org.scalatest.funsuite.AnyFunSuite

/** c59 robots-policy diff + re-enqueue: distributed results must equal the
  * single-threaded mirrors built on the SAME kernels the crawl oracle uses
  * (CrawlOracle.robotsAllowed), and both flip directions must behave.
  */
class RobotsDiffSpec extends AnyFunSuite {

  test("policy diff == local rule-set diff; both flip directions present") {
    val oldR = Gen.robotsLocal().map(r => r.host -> r).toMap
    val newR = RobotsDiffOps.mutatedRobotsLocal().map(r => r.host -> r).toMap
    val dist = RobotsDiffOps.robotsPolicyDiff(
        Gen.robots(spark).toDF(), RobotsDiffOps.mutatedRobots(spark).toDF())
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = oldR.keys.flatMap { h =>
      val o = oldR(h).rules.toSet
      val n = newR(h).rules.toSet
      val added = (n -- o).size.toLong
      val removed = (o -- n).size.toLong
      if (added > 0 || removed > 0) Some(h -> ((added, removed))) else None
    }.toMap
    assert(dist == want)
    assert(want.values.exists(_._1 > 0), "no tightened host in the mutation")
    assert(want.values.exists(_._2 > 0), "no opened host in the mutation")
  }

  test("newly-allowed == kernel mirror; opened hosts re-enqueue, tightened don't") {
    import org.apache.spark.sql.functions.{broadcast, col}
    val oldDf = Gen.robots(spark).toDF()
    val newDf = RobotsDiffOps.mutatedRobots(spark).toDF()
    val frontier = FrontierJob.canonicalizeFrontier(Gen.seeds(spark, 20000L, 8))
    val held = frontier
      .join(broadcast(oldDf.select(col("host"), col("rules"))), Seq("host"))
      .where(!FrontierJob.robotsAllowedCol(col("rules"), col("path")))
      .select("url_hash", "host", "path", "priority")
    val heldRows = held.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(heldRows.nonEmpty, "no held-back URLs under the old policy")
    val dist = RobotsDiffOps.newlyAllowed(held, oldDf, newDf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val oldR = Gen.robotsLocal().map(r => r.host -> r.rules).toMap
    val newR = RobotsDiffOps.mutatedRobotsLocal().map(r => r.host -> r.rules).toMap
    val want = heldRows.filter { case (_, host, path) =>
      !CrawlOracle.robotsAllowed(oldR(host), path) &&
        CrawlOracle.robotsAllowed(newR(host), path)
    }.toSet
    assert(dist == want, s"re-enqueue set diverged (dist=${dist.size}, want=${want.size})")
    assert(dist.nonEmpty, "opened policies re-enqueued nothing")
    // every re-enqueued path was opened by the politics-rule drop; hosts
    // that only TIGHTENED contribute none
    val openedHosts = oldR.keys.filter(h => oldR(h) != newR(h) &&
      oldR(h).exists(r => !r.allow && r.prefix == "/news/politics")).toSet
    assert(dist.forall(t => openedHosts(t._2)))
    assert(dist.forall(_._3.startsWith("/news/politics")))
    // the opposite flip: already-fetched rows newly disallowed == mirror;
    // only TIGHTENED hosts contribute, on the new /news/sports rule
    val fetched = frontier
      .join(broadcast(oldDf.select(col("host"), col("rules"))), Seq("host"))
      .where(FrontierJob.robotsAllowedCol(col("rules"), col("path")))
      .select("url_hash", "host", "path", "priority")
    val purged = RobotsDiffOps.newlyDisallowed(fetched, oldDf, newDf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val wantPurged = fetched.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter { case (_, host, path) =>
        CrawlOracle.robotsAllowed(oldR(host), path) &&
          !CrawlOracle.robotsAllowed(newR(host), path)
      }.toSet
    assert(purged == wantPurged)
    assert(purged.nonEmpty, "tightened policies purged nothing")
    assert(purged.forall(_._3.startsWith("/news/sports")))
  }

  test("pipeline robotsFlipEpoch: held-back URLs re-enter and schedule at the flip; control never schedules them") {
    import org.apache.spark.sql.functions.col
    val on = graft.SparkTestBase.tempDir("graft-flip-on")
    val off = graft.SparkTestBase.tempDir("graft-flip-off")
    val cfg = FrontierJob.Config(epoch = 0, globalBudget = 100000)
    CrawlPipeline.run(spark, on, untilEpoch = 1, seedsPerEpoch = 400,
      cfg0 = cfg, robotsFlipEpoch = 1)
    CrawlPipeline.run(spark, off, untilEpoch = 1, seedsPerEpoch = 400,
      cfg0 = cfg)
    // only hosts whose OLD policy disallowed /news/politics matter —
    // other hosts schedule politics paths freely under both generations
    val gatedHosts = Gen.robotsLocal()
      .filter(_.rules.exists(r => !r.allow && r.prefix == "/news/politics"))
      .map(_.host).toSet
    assert(gatedHosts.nonEmpty)
    def politicsScheduled(root: String, epoch: Int): Set[Long] = {
      val rows = spark.read.parquet(s"$root/scheduled/epoch=$epoch")
        .where(col("path").startsWith("/news/politics"))
        .select("url_hash", "host").collect()
      rows.filter(r => gatedHosts(r.getString(1))).map(_.getLong(0)).toSet
    }
    // epoch 0: both runs gate identically under the old policy
    assert(politicsScheduled(on, 0).isEmpty)
    assert(politicsScheduled(off, 0).isEmpty)
    // epoch 1: the flip run schedules previously-held politics URLs from
    // epoch 0's persisted holds; the control run still schedules none
    val flipped = politicsScheduled(on, 1)
    assert(flipped.nonEmpty, "no held-back URL re-entered at the flip")
    assert(politicsScheduled(off, 1).isEmpty)
    // every re-entered URL was actually held under the old policy
    val held0 = spark.read.parquet(s"$on/robots_held/epoch=0")
      .select("url_hash").collect().map(_.getLong(0)).toSet
    // (epoch-1 natural seeds may also land politics paths under the NEW
    // policy — those are fine; at least one comes from the held set)
    assert(flipped.intersect(held0).nonEmpty)
  }

  test("pipeline robotsFlipEpoch: newly-disallowed rows purge from latest == kernel mirror; control keeps them") {
    import org.apache.spark.sql.functions.col
    import graft.functions.UrlKit
    import graft.sources.Snapshots
    val on = graft.SparkTestBase.tempDir("graft-purge-on")
    val off = graft.SparkTestBase.tempDir("graft-purge-off")
    val cfg = FrontierJob.Config(epoch = 0, globalBudget = 100000)
    CrawlPipeline.run(spark, on, untilEpoch = 1, seedsPerEpoch = 400,
      cfg0 = cfg, robotsFlipEpoch = 1)
    CrawlPipeline.run(spark, off, untilEpoch = 1, seedsPerEpoch = 400,
      cfg0 = cfg)
    def ids(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select("image_id").collect().map(_.getString(0)).toSet
    // kernel mirror of the purge list over the shared epoch-0 latest table
    // (flip at epoch 1 leaves epoch 0 byte-identical across runs)
    val latest0 = ids(Snapshots.readLatest(spark, on, 0))
    val oldRules = Gen.robotsLocal().map(r => r.host -> r.rules).toMap
    val newRules = RobotsDiffOps.mutatedRobotsLocal().map(r => r.host -> r.rules).toMap
    val expected = latest0.filter { id =>
      val h = UrlKit.hostOf(id); val p = UrlKit.pathOf(id)
      oldRules.get(h).exists(rs => CrawlOracle.robotsAllowed(rs, p)) &&
        newRules.get(h).exists(rs => !CrawlOracle.robotsAllowed(rs, p))
    }
    assert(expected.nonEmpty, "no newly-disallowed fetched row planted")
    // persisted purge list == mirror, and it is the tighten mutation
    val purged = spark.read.parquet(s"$on/robots_purged/epoch=1")
    assert(ids(purged) == expected)
    assert(purged.select("path").collect()
      .forall(_.getString(0).startsWith("/news/sports")))
    // purged latest == (prev latest minus purge) ∪ current epoch, exactly
    val cur1 = ids(Snapshots.read(spark, on, 1))
    assert(ids(Snapshots.readLatest(spark, on, 1)) == (latest0 -- expected) ++ cur1)
    // the control run carries every purged row forward
    assert(expected.subsetOf(ids(Snapshots.readLatest(spark, off, 1))))
  }
}
