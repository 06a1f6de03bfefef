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

  // --------------------------------------------------------------------
  // Mergeable per-epoch HLL sketch store (c26) — Flajolet et al. AofA'07
  // HyperLogLog via Spark's built-in DataSketches agg functions.
  //
  // Why the crawl needs it: "how many distinct URLs has each host
  // contributed so far" drives per-host budget allocation, but recrawled
  // URLs appear in MANY epochs, so per-epoch exact counts cannot be
  // summed, and the exact answer needs a distinct over the full 10^10-row
  // history every time it is asked. The HLL register state is a pure
  // max-merge — so each epoch pays ONE narrow pass over its own rows to
  // produce a (host, sketch) table of ~2^lgK bytes per host, and the
  // cumulative answer is a merge over those tiny tables (or O(1) per host
  // against a compacted sketch), never a rescan. This is the S8/SeenStore
  // epoch-layout discipline applied to cardinality state.
  // --------------------------------------------------------------------

  /** Deterministic epoch frontier slice [lo, hi) of the n-row seed space,
    * reduced to (host, url_hash) over CANONICAL urls. Slices overlap in
    * canonical-URL space by construction (the ~70% article space plus
    * dirt variants), which is exactly what makes summing per-epoch exact
    * counts wrong and sketch-merging right.
    */
  def epochHostUrls(spark: SparkSession, lo: Long, hi: Long, n: Long): DataFrame = {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val canon = GraftFunctions.canonUrl(col("url"))
    spark.range(lo, hi, 1L, spark.sparkContext.defaultParallelism)
      .mapPartitions(_.map(i => Gen.seedOf(i, n)))
      .select(GraftFunctions.hostOf(canon).as("host"),
        xxhash64(canon).as("url_hash"))
  }

  /** One HLL sketch per host over this epoch's url hashes, persisted to
    * `root/url_hll/epoch=N`. lgK=12 → 4 KiB registers / ~1.6% σ per host.
    */
  def writeEpochHostHll(frontier: DataFrame, root: String, epoch: Int,
                        lgK: Int = 12): Unit =
    frontier.groupBy("host")
      .agg(hll_sketch_agg(col("url_hash"), lgK).as("hll"))
      .write.mode("overwrite").parquet(s"$root/url_hll/epoch=$epoch")

  /** Cumulative distinct URLs per host over persisted epochs `<= upTo`
    * (all epochs when upTo < 0): a max-merge over the sketch tables —
    * bytes scanned scale with hosts x epochs, NOT with crawl history.
    */
  def cumulativeDistinctPerHost(spark: SparkSession, root: String,
                                upTo: Int = -1): DataFrame = {
    val sketches = spark.read.parquet(s"$root/url_hll")
    val inRange = if (upTo < 0) sketches else sketches.where(col("epoch") <= upTo)
    inRange.groupBy("host")
      .agg(hll_union_agg(col("hll"), allowDifferentLgConfigK = false).as("hll"))
      .select(col("host"), hll_sketch_estimate(col("hll")).as("est_distinct"))
  }

  /** Compact epochs `<= upTo` into one merged sketch per host
    * (`root/url_hll_compact/upto=N`) — the SeenStore compaction
    * discipline: after compaction a cumulative answer is the compact
    * table + the tail epochs, O(1) sketch state per host regardless of
    * how many epochs history holds.
    */
  def compactHostHll(spark: SparkSession, root: String, upTo: Int): Unit =
    spark.read.parquet(s"$root/url_hll").where(col("epoch") <= upTo)
      .groupBy("host")
      .agg(hll_union_agg(col("hll"), allowDifferentLgConfigK = false).as("hll"))
      .write.mode("overwrite").parquet(s"$root/url_hll_compact/upto=$upTo")

  /** Cumulative estimate from a compacted prefix + the tail epochs in
    * (compactedUpTo, upTo] — never re-reads the compacted epochs.
    */
  def cumulativeFromCompact(spark: SparkSession, root: String,
                            compactedUpTo: Int, upTo: Int): DataFrame = {
    val compact = spark.read.parquet(s"$root/url_hll_compact/upto=$compactedUpTo")
      .select(col("host"), col("hll"))
    val tail = spark.read.parquet(s"$root/url_hll")
      .where(col("epoch") > compactedUpTo && col("epoch") <= upTo)
      .select(col("host"), col("hll"))
    compact.unionByName(tail)
      .groupBy("host")
      .agg(hll_union_agg(col("hll"), allowDifferentLgConfigK = false).as("hll"))
      .select(col("host"), hll_sketch_estimate(col("hll")).as("est_distinct"))
  }

  /** c26 — the end-to-end demo over three overlapping recrawl epochs:
    * per-epoch sketch tables, cumulative merge, and the exact distinct
    * (verification arm; a production caller reads only (host,
    * est_distinct)). Spec asserts merged tracks the one-shot sketch
    * within 1% (union answers via the composite estimator, a direct
    * build via HIP) and the ~1.6%-σ relative-error bound vs exact.
    */
  def epochDistinctDemo(spark: SparkSession, n: Long): DataFrame = {
    val root = graft.SparkEnv.scratchDir("graft-c26")
    val spans = Seq((0L, n / 2), (n / 3, 3 * n / 4), (3 * n / 5, n))
    spans.zipWithIndex.foreach { case ((lo, hi), ep) =>
      writeEpochHostHll(epochHostUrls(spark, lo, hi, n), root, ep)
    }
    val est = cumulativeDistinctPerHost(spark, root)
    val exact = spans.map { case (lo, hi) => epochHostUrls(spark, lo, hi, n) }
      .reduce(_ unionByName _)
      .groupBy("host")
      .agg(countDistinct(col("url_hash")).as("exact_distinct"))
    est.join(exact, Seq("host"))
      .select(col("host"), col("est_distinct"), col("exact_distinct"))
      .orderBy("host")
  }
}
