package graft.operators

import graft.SparkTestBase.spark
import graft.operators.{FrontierJob, PacingOps}
import graft.sources.Gen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** c30 goldens: the adaptive-pacing report must equal a single-threaded
  * mirror (disc-percentile semantics included), slow hosts must learn
  * strictly larger delays, and the robots merge must be a floor-keeping
  * action the real scheduler honors.
  */
class PacingSpec extends AnyFunSuite {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  /** percentile_disc: smallest value whose cume_dist >= p — 1-based
    * index ceil(p * n) in the sorted list.
    */
  private def p95(xs: Seq[Long]): Long = {
    val sorted = xs.sorted
    sorted(math.ceil(0.95 * xs.size).toInt - 1)
  }

  private def mirror(): Map[String, (Long, Long, Long)] = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.groupBy(_._2).map { case (host, xs) =>
      val lats = xs.map { case (id, src) =>
        50L + (id * 37L) % 200L +
          (if (Seq('3', '7').contains(src.last) && id % 3 == 0) 900L else 0L)
      }.toSeq
      val p = p95(lats)
      host -> (lats.size.toLong, p,
        math.min(15000L, math.max(200L, p * 10L)))
    }
  }

  test("c30 report == single-threaded mirror exactly") {
    val got = PacingOps.pacingReport(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == mirror())
  }

  test("slow hosts learn strictly larger delays than every fast host") {
    val rep = mirror()
    val (slow, fast) = rep.partition { case (h, _) => Seq('3', '7').contains(h.last) }
    assert(slow.nonEmpty && fast.nonEmpty, "plant missing a host class")
    val minSlow = slow.values.map(_._3).min
    val maxFast = fast.values.map(_._3).max
    assert(minSlow > maxFast,
      s"tail latency not learned: slow min $minSlow <= fast max $maxFast")
  }

  test("histogram store (3 slices) == one-shot batch report exactly") {
    val root = graft.SparkTestBase.tempDir("graft-pacing-inc")
    val rows = PacingOps.syntheticFetchLatencies(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    (0 until 3).foreach { k =>
      PacingOps.writeLatencyEpoch(
        rows.zipWithIndex.filter(_._2 % 3 == k).map(_._1)
          .toSeq.toDF("host", "latency_ms"), root, k)
    }
    val inc = PacingOps.adaptiveDelaysFrom(spark, root, uptoEpoch = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val batch = PacingOps.pacingReport(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(inc == batch, "histogram-store delays diverged from batch report")
  }

  test("streaming demo (c32) == batch report") {
    val streamed = graft.streaming.StreamingJobs.pacingMineDemo(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val batch = PacingOps.pacingReport(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(streamed == batch, "streamed delays diverged from batch report")
  }

  test("action: learned delays raise per-host schedule gaps; robots floor kept") {
    val host0 = Gen.hostName(0)
    // host0's tail: every 5th observation takes 500 ms -> learned delay 5000 ms
    val lats = (0 until 40).map(i => (host0, if (i % 5 == 0) 500L else 60L))
      .toDF("host", "latency_ms")
    val report = PacingOps.adaptiveDelays(lats)
    val robots = Gen.robots(spark)
    val before = robots.where(col("host") === host0)
      .head().crawl_delay_ms
    val merged = PacingOps.withAdaptiveDelays(robots, report)
    val after = merged.where(col("host") === host0)
      .head().crawl_delay_ms
    assert(after == math.max(before, 5000L))
    // hosts without observations keep their robots row bit-identically
    assert(merged.where(col("host") =!= host0).collect().toSet ==
      robots.where(col("host") =!= host0).collect().toSet)
    // and the real scheduler paces host0 at the learned delay
    val cfg = FrontierJob.Config()
    val sched = FrontierJob.schedule(
      FrontierJob.applyRobots(
        FrontierJob.canonicalizeFrontier(Gen.seeds(spark, 400)), merged, cfg), cfg)
    val times = sched.where(col("host") === host0)
      .orderBy("slot").select("scheduled_at_ms").as[Long].collect()
    assert(times.length > 1, "host0 scheduled fewer than 2 URLs — gap check vacuous")
    times.sliding(2).foreach {
      case Array(a, b) => assert(b - a == after, s"gap ${b - a} != $after")
      case _ =>
    }
  }
}
