package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the slowest bench demos (not part of the driver
  * contract; safe to delete). Times each call and prints the Spark job
  * count so fixed-overhead (many tiny actions) separates from real work.
  */
object ProbeSlow {
  val stageAgg = new java.util.concurrent.ConcurrentHashMap[String, (Int, Int)]
  val jobSites = new java.util.concurrent.ConcurrentHashMap[Int, String]

  def main(args: Array[String]): Unit = {
    val spark = SparkEnv.applyCommon(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32))
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
        val site = Option(j.properties)
          .map(p => p.getProperty("callSite.short", "?")).getOrElse("?")
        ProbeSlow.jobSites.put(j.jobId, site)
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = t0s.remove(j.jobId)
        if (t0 != 0L) {
          jobMs.addAndGet(j.time - t0)
          val site = ProbeSlow.jobSites.remove(j.jobId)
          if (site != null)
            ProbeSlow.stageAgg.merge(site, ((j.time - t0).toInt, 1),
              (a, b) => (a._1 + b._1, a._2 + b._2))
        }
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()

    })
    def time(name: String)(f: => Long): Unit = {
      jobs.set(0); tasks.set(0); jobMs.set(0)
      ProbeSlow.stageAgg.clear()
      val t0 = System.nanoTime()
      val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[probe] $name%-28s wall=$wall%7.2fs rows=$n%6d jobs=${jobs.get}%4d tasks=${tasks.get}%6d inJobMs=${jobMs.get}%6d")
      import scala.jdk.CollectionConverters._
      ProbeSlow.stageAgg.asScala.toSeq.sortBy(-_._2._1).take(8).foreach {
        case (site, (t, c)) =>
          println(f"[probe]    jobMs=$t%7d jobs=$c%4d  $site")
      }
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "c44_priority_aging", "c85_host_health", "c51_revalidation",
      "c34_budget_allocation", "c54_byte_budget", "c67_payload_gate",
      "c83_failure_retry", "c53_vacuum", "c44_priority_aging")
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n, sys.error(s"unknown query: $n"))
      time(n)(fn(spark, sfDir).count())
    }
    spark.stop()
  }
}
