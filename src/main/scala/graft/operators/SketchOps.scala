package graft.operators

import graft.functions.GraftFunctions
import graft.sources.Gen
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Frequency sketches over the frontier (count-min, Cormode-Muthukrishnan
  * J. Algorithms '05 — Spark's built-in mergeable `util.sketch`
  * implementation, kept inside the codegen'd agg path).
  *
  * Why the crawl needs one: politeness capacity planning and adaptive
  * skew handling both start from "which hosts dominate the frontier".
  * The exact answer is a groupBy(host).count() over the full frontier —
  * at 10^10 rows that is a key-shuffle whose only consumer wants the top
  * handful of keys. A count-min sketch answers the same question in ONE
  * narrow pass with fixed memory (depth x width counters, merged
  * associatively across partitions — no key shuffle at all), with a
  * one-sided guarantee: estimates never undercount, and overcount is
  * bounded by ~2N/width per row with high probability. Hosts whose
  * estimate clears the hot threshold can never be missed (est >= exact);
  * false positives cost only a wasted exact re-check of that host.
  */
object SketchOps {

  /** c22 — hot-host detection: sketch the frontier's host column, probe
    * the bounded host catalog (the robots cache — the crawl already
    * maintains it; ~10^6 hosts vs 10^10 frontier rows), keep hosts whose
    * estimate clears `hotFactor` x the uniform share. The `exact` /
    * `overcount` columns are the verification arm (the spec asserts the
    * CMS one-sided bound row by row); a production caller reads only
    * (host, est).
    */
  def hotHosts(spark: SparkSession, n: Long, depth: Int = 5, width: Int = 1024,
               hotFactor: Double = 2.0): DataFrame = {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val hosts = Gen.seeds(spark, n)
      .select(GraftFunctions.hostOf(GraftFunctions.canonUrl(col("url"))).as("host"))
    val cms = hosts.stat.countMinSketch(col("host"), depth, width, seed = 42)
    val bc = spark.sparkContext.broadcast(cms)
    val est = Gen.robots(spark).select(col("host")).as[String].distinct()
      .map(h => (h, bc.value.estimateCount(h)))
      .toDF("host", "est")
    val exact = hosts.groupBy("host").agg(count(lit(1)).cast("long").as("exact"))
    val threshold = math.ceil(hotFactor * n.toDouble / Gen.NumHosts).toLong
    est.join(exact, Seq("host"), "left")
      .na.fill(0L, Seq("exact"))
      .where(col("est") >= threshold)
      .select(col("host"), col("est"), col("exact"),
        (col("est") - col("exact")).as("overcount"))
      .orderBy(col("est").desc, col("host").asc)
  }
}
