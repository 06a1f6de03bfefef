package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time a named subset of SparkEntry.queries without paying for
  * the whole bench. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.QueryProbe q55_domain_rollup c51_revalidation"
  * Each query runs twice (cold, warm) so plan/codegen cost separates from
  * execution cost.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEnv.applyCommon(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count()
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[probe] $name run$i ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
      }
    }
    spark.stop()
  }
}
