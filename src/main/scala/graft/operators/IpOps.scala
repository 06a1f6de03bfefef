package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** c70 — per-IP politeness: production crawlers key the politeness budget
  * by RESOLVED ADDRESS as well as by host, because shared hosting fans
  * hundreds of virtual hosts out over one server — a per-host budget
  * multiplied by the vhost count hammers that one box (the classic
  * IRLbot/Heritrix politeness concern). The cap composes with the
  * existing per-host schedule exactly like the registrable-domain cap
  * (P6b): applied AFTER FrontierJob.schedule on the schedule-sized table,
  * SHRINK-only, deterministic cut order (priority desc, url_hash asc).
  */
object IpOps {

  /** Synthetic DNS catalog over a host column: each host resolves to one
    * of `nIps` addresses by stable hash (models ordinary co-hosting),
    * except hosts under `farmSuffix`, which ALL resolve to the single
    * farm address — the planted vhost farm the per-IP cap exists for.
    * Deterministic, engine-hash-based (xxhash64), no RNG.
    */
  def syntheticDns(hosts: DataFrame, nIps: Int = 64,
                   farmSuffix: String = ".shared.example.com"): DataFrame = {
    require(nIps >= 1 && nIps <= 254, "nIps must fit one /24 octet")
    hosts.select(col("host")).distinct()
      .withColumn("ip",
        when(col("host").endsWith(farmSuffix), lit("10.0.0.1"))
          .otherwise(concat(lit("10.0.1."),
            (pmod(xxhash64(col("host")), lit(nIps.toLong)) + 1)
              .cast("string"))))
  }

  /** Per-IP cap on top of the per-host schedule. The DNS side is
    * host-cardinality (tiny vs the frontier) and broadcasts; the window
    * ranks the already-schedule-sized input, never the frontier. A host
    * the catalog cannot resolve fails OPEN as its own bucket (keyed by
    * host) — politeness must not silently drop unresolved hosts, and a
    * missing A record is a fetch-time concern, not a scheduling one.
    */
  def applyIpBudget(scheduled: DataFrame, dns: DataFrame,
                    ipBudget: Int): DataFrame = {
    val w = Window.partitionBy("ip_key")
      .orderBy(col("priority").desc, col("url_hash").asc)
    scheduled
      .join(broadcast(dns.select("host", "ip")), Seq("host"), "left")
      .withColumn("ip_key", coalesce(col("ip"), col("host")))
      .withColumn("ip_rank", row_number().over(w))
      .where(col("ip_rank") <= ipBudget)
      .drop("ip", "ip_key", "ip_rank")
  }

  /** c70 demo rows: a 40-host schedule-shaped table (10 hosts form a
    * vhost farm on one address), before/after row counts per resolved
    * address — the farm lands exactly at the cap while ordinary co-hosted
    * sites keep everything under it.
    */
  def ipBudgetDemo(spark: SparkSession, n: Long = 30000L,
                   budget: Int = 25): DataFrame = {
    val sched = spark.range(0, n).select(
      xxhash64(col("id")).as("url_hash"),
      when(pmod(col("id"), lit(40)) < 10,
        concat(lit("vh"), pmod(col("id"), lit(40)).cast("string"),
          lit(".shared.example.com")))
        .otherwise(concat(lit("site"), pmod(col("id"), lit(40)).cast("string"),
          lit(".example.org"))).as("host"),
      (pmod(xxhash64(col("id") + 1), lit(1000)) / lit(100.0)).as("priority"))
    val dns = syntheticDns(sched.select("host"))
    val ipOf = dns.withColumnRenamed("ip", "ip_key")
    sched.join(broadcast(ipOf), Seq("host"))
      .groupBy("ip_key").agg(count(lit(1)).cast("long").as("n_before"))
      .join(
        applyIpBudget(sched, dns, budget)
          .join(broadcast(ipOf), Seq("host"))
          .groupBy("ip_key").agg(count(lit(1)).cast("long").as("n_capped")),
        Seq("ip_key"))
      .orderBy("ip_key")
  }
}
