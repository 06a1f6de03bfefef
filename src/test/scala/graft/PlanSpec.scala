package graft

import graft.SparkTestBase.spark
import graft.operators.{DiffJob, FrontierJob, Relational}
import graft.sources.{Gen, SeenStore}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan property tests: the scale claims in README/SURVEY are
  * pinned here so a refactor that silently de-optimizes a plan (probe
  * falls out of codegen, bytes column sneaks into a scan, pushdown lost)
  * fails CI, not a 100 TB run.
  */
class PlanSpec extends AnyFunSuite {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString()

  /** Final plan AFTER execution — AQE only collapses codegen stages (the
    * `*(n)` markers) once the query has run; collect() drives THIS
    * QueryExecution (a write would re-plan a fresh one and leave this plan
    * isFinalPlan=false).
    */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString()
  }

  test("frontier bloom probe is a codegen expression inside the scan stage (no UDF)") {
    val seen = Seq(graft.model.SeenEntry(42L, "h", 0)).toDS()
    val blooms = SeenStore.buildBlooms(seen, numBuckets = 16, expectedPerBucket = 128)
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    val deduped = FrontierJob.dedupeAgainstSeen(
      FrontierJob.canonicalizeFrontier(Gen.seeds(spark, 100)), seen, blooms, 16)
    val p = finalPlan(deduped)
    assert(p.contains("bloom_maybe_seen"), "bloom probe expression missing from plan")
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("scalaudf"),
      "bloom probe fell back to a UDF")
    // the probe filter must sit inside a WholeStageCodegen span: the final
    // plan prefixes codegen'd operators with '*(n)'
    val probeLine = p.linesIterator.find(_.contains("bloom_maybe_seen")).get
    assert(probeLine.contains("*("),
      s"bloom probe not in a codegen stage: $probeLine")
  }

  test("revision diff scans never read the bytes column (both forms)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-planspec").toString
    spark.createDataset((0 until 10).map(i =>
      Gen.snapshotRow(s"http://h/a-$i", 0, 0, "png", epoch = 0)))
      .drop("epoch").write.mode("overwrite").parquet(s"$dir/snapshots/epoch=0")
    val hist = spark.read.parquet(s"$dir/snapshots")
    val pWindow = plan(DiffJob.revisions(hist, 0, 10).toDF())
    val latestPrev = graft.sources.Snapshots.readLatest(spark, dir, -1)
    val pLatest = plan(DiffJob.revisionsFromLatest(hist, latestPrev, 0, 10).toDF())
    for ((name, p) <- Seq("window" -> pWindow, "latest" -> pLatest)) {
      p.linesIterator.filter(_.contains("ReadSchema")).foreach { l =>
        assert(!l.contains("bytes"), s"$name diff scan reads bytes: $l")
      }
    }
  }

  test("q01 pushes the shipdate filter into the parquet scan") {
    val p = plan(Relational.aggPricing(spark, "/root/testdata/sf0.001"))
    val scanLine = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(scanLine.contains("LessThanOrEqual(l_shipdate") ||
      scanLine.contains("IsNotNull(l_shipdate"),
      s"no pushed filter on lineitem scan: $scanLine")
    // column pruning: the 7-of-16-column projection reaches the reader
    val readLine = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readLine.contains("l_comment"), s"scan reads unprojected columns: $readLine")
  }

  test("robots join broadcasts; politeness agg is partial+final (map-side combine)") {
    val cfg = FrontierJob.Config()
    val allowed = FrontierJob.applyRobots(
      FrontierJob.canonicalizeFrontier(Gen.seeds(spark, 100)), Gen.robots(spark), cfg)
    assert(plan(allowed).contains("BroadcastHashJoin"), "robots join not broadcast")
    val sched = FrontierJob.schedule(allowed, cfg)
    val p = plan(sched)
    // typed Aggregator via udaf() plans as ObjectHashAggregate with a
    // partial pass before the exchange
    val aggIdx = p.linesIterator.zipWithIndex.filter(_._1.contains("ObjectHashAggregate")).map(_._2).toSeq
    assert(aggIdx.size >= 2, s"expected partial+final ObjectHashAggregate pair:\n$p")
  }
}
