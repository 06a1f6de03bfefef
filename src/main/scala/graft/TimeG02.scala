package graft
import org.apache.spark.sql.functions._
import graft.operators._
object TimeG02 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("timeg02")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    def g02(coal: Boolean): Long = {
      val base = SparkEntry.entryScheduleForBench(spark).as[graft.model.Scheduled]
      val sched = (if (coal) base.coalesce(8) else base).localCheckpoint()
      val outs = CrawlPipeline.outlinks(sched, fanout = 2, crossHost = true)
      val edges = CrawlPipeline.hostEdgesFromScheduled(sched, fanout = 2)
      val ranks = GraphOps.pageRank(spark, edges, iters = 5, damping = 0.85)
      CrawlPipeline.rankBoosted(outs, ranks).toDF()
        .groupBy(graft.functions.GraftFunctions.hostOf(col("url")).as("host"))
        .agg(count(lit(1)).as("n"), round(sum(col("priority")), 6).as("pm"))
        .orderBy("host").collect().length.toLong
    }
    for (r <- 1 to 3; coal <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val n = g02(coal)
      println(f"g02 coal=$coal run$r: ${(System.nanoTime()-t0)/1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
