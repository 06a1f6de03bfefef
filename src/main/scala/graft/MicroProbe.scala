package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: does raw Spark work scale with cores in this sandbox?
  * Run one level per JVM: spark-submit --master local[N] --class
  * graft.MicroProbe <jar> [cores-label].
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val label = spark.sparkContext.master
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[micro] $label $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    // warm all paths
    spark.range(0, 200000000L, 1, 64).select(sum(bit_count(xxhash64(col("id"))))).collect()
    spark.range(0, 5000000L, 1, 64)
      .groupBy(pmod(xxhash64(col("id")), lit(1000)).as("k")).count().collect()
    graft.functions.GraftFunctions.ensureRegistered(spark)
    graft.sources.Gen.seeds(spark, 100000, 64)
      .select(graft.functions.GraftFunctions.canonUrl(col("url")).as("u"))
      .select(count(col("u"))).collect()
    // timed
    time("hash-8g")(
      spark.range(0, 8000000000L, 1, 64).select(sum(bit_count(xxhash64(col("id"))))).collect())
    time("hash-8g-b")(
      spark.range(0, 8000000000L, 1, 64).select(sum(bit_count(xxhash64(col("id"))))).collect())
    time("groupby-200m")(
      spark.range(0, 200000000L, 1, 64)
        .groupBy(pmod(xxhash64(col("id")), lit(1000)).as("k")).count().collect())
    time("canon-4m")(
      graft.sources.Gen.seeds(spark, 4000000, 64)
        .select(graft.functions.GraftFunctions.canonUrl(col("url")).as("u"))
        .select(count(col("u"))).collect())
    time("canon-4m-b")(
      graft.sources.Gen.seeds(spark, 4000000, 64)
        .select(graft.functions.GraftFunctions.canonUrl(col("url")).as("u"))
        .select(count(col("u"))).collect())
    spark.stop()
  }
}
