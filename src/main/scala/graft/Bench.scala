package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkEnv.applyCommon(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic order + a tiny first action to absorb session spin-up
    spark.range(1000).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // headline metric companion: E1 frontier throughput (URLs deduped +
    // scheduled per second, BASELINE.md numerator) at this session's
    // parallelism on a 1M synthetic frontier — the cross-level scaling
    // evidence lives in BENCH/BASELINE.md (graft.ScalingBench).
    val frontier = {
      import graft.operators.FrontierJob
      import graft.sources.{Gen, SeenStore}
      val n = 1000000L
      val cfg = FrontierJob.Config(epoch = 0, saltBuckets = 64)
      def job() = FrontierJob.runEpoch(Gen.seeds(spark, n, 64), Gen.robots(spark),
        SeenStore.emptySeen(spark), Map.empty, 64, cfg)
      job().write.format("noop").mode("overwrite").save() // warm
      val numer = FrontierJob.canonicalizeFrontier(Gen.seeds(spark, n, 64)).count() +
        job().count()
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        job().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      numer / walls.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""frontier_urls_per_sec":${f"$frontier%.1f"},"frontier_cores":$cpus,"sf":"$sfDir"}""")
    spark.stop()
  }
}
