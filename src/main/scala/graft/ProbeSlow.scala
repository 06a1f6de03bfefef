package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the slowest bench demos (not part of the driver
  * contract; safe to delete). Times each call and prints the Spark job
  * count so fixed-overhead (many tiny actions) separates from real work.
  */
object ProbeSlow {
  def main(args: Array[String]): Unit = {
    val spark = SparkEnv.applyCommon(SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count()
    val sc = spark.sparkContext
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val jobMs = new java.util.concurrent.atomic.AtomicLong
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val t0s = new java.util.concurrent.ConcurrentHashMap[Int, Long]
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); t0s.put(j.jobId, j.time)
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = t0s.remove(j.jobId); if (t0 != 0L) jobMs.addAndGet(j.time - t0)
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    def time(name: String)(f: => Long): Unit = {
      jobs.set(0); tasks.set(0); jobMs.set(0)
      val t0 = System.nanoTime()
      val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[probe] $name%-28s wall=$wall%7.2fs rows=$n%6d jobs=${jobs.get}%4d tasks=${tasks.get}%6d inJobMs=${jobMs.get}%6d")
    }
    time("c53_vacuum")(operators.RetentionOps.vacuumDemo(spark).count())
    time("c44_aging")(operators.CrawlPipeline.agingDemo(spark).count())
    time("c51_revalidation")(operators.RevalidationOps.revalidationDemo(spark).count())
    time("c54_byte_budget")(operators.BandwidthOps.bandwidthDemo(spark).count())
    time("c44_aging_warm")(operators.CrawlPipeline.agingDemo(spark).count())
    spark.stop()
  }
}
