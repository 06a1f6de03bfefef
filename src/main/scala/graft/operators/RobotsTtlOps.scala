package graft.operators

import graft.model.RobotsEntry
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** robots.txt cache TTL (c33) — the freshness policy behind the
  * north_rule's "robots.txt caching": a cached entry is only valid for
  * so long (production crawlers re-fetch on the order of a day), and a
  * crawl that schedules pages under a STALE policy risks fetching what
  * the site has since disallowed. The conservative discipline:
  *
  *   1. hosts whose entry age exceeds the TTL are stale;
  *   2. their pages are HELD BACK this wave (they re-enter the frontier
  *      next epoch, when the refreshed entry can vet them);
  *   3. one robots-fetch slot per stale host is scheduled INSTEAD —
  *      top priority, so the refresh lands before the held pages retry.
  *
  * Scale shape: the stale list is host-catalog-sized — both the hold-back
  * anti-join and the semi-join broadcast it; the frontier never shuffles.
  */
object RobotsTtlOps {

  /** Stale robots entries at `epoch` under `ttlEpochs`. */
  def staleHosts(robots: Dataset[RobotsEntry], epoch: Int,
                 ttlEpochs: Int): DataFrame =
    robots.toDF()
      .select(col("host"), col("fetched_epoch"),
        (lit(epoch) - col("fetched_epoch")).as("age"))
      .where(col("age") > ttlEpochs)

  /** Split a frontier on robots freshness: (schedulable now, held back).
    * Disjoint and complete by construction (anti + semi on one list).
    */
  def splitByRobotsFreshness(frontier: DataFrame,
                             stale: DataFrame): (DataFrame, DataFrame) = {
    val staleList = broadcast(stale.select("host"))
    (frontier.join(staleList, Seq("host"), "left_anti"),
      frontier.join(staleList, Seq("host"), "left_semi"))
  }

  /** One top-priority robots-fetch slot per stale host. */
  def robotsFetchSlots(stale: DataFrame, epochT0Ms: Long): DataFrame =
    stale.select(col("host"),
      concat(lit("http://"), col("host"), lit("/robots.txt")).as("url"),
      lit(1.0).as("priority"),
      lit(0L).as("slot"),
      lit(epochT0Ms).as("scheduled_at_ms"))

  /** c33 — the driver-facing report: per host, entry age, the verdict,
    * and how the wave splits (held vs schedulable), plus whether a
    * robots fetch was scheduled. Synthetic staleness: fetched_epoch is
    * xxhash64(host) mod 4, evaluated at epoch 3 with TTL 1 — both
    * verdicts occur. Crawl-domain (rows-only gate + RobotsTtlSpec).
    */
  def ttlReport(spark: org.apache.spark.sql.SparkSession,
                epoch: Int = 3, ttlEpochs: Int = 1): DataFrame = {
    import spark.implicits._
    val robots = graft.sources.Gen.robots(spark).toDF()
      .withColumn("fetched_epoch",
        pmod(xxhash64(col("host")), lit(4L)).cast("int"))
      .as[RobotsEntry]
    val frontier = FrontierJob.canonicalizeFrontier(
      graft.sources.Gen.seeds(spark, 4000))
    val stale = staleHosts(robots, epoch, ttlEpochs)
    val (pass, held) = splitByRobotsFreshness(frontier, stale)
    val slots = robotsFetchSlots(stale, epochT0Ms = 0L)
    robots.toDF().select(col("host"),
        (lit(epoch) - col("fetched_epoch")).as("age"))
      .withColumn("stale", col("age") > ttlEpochs)
      .join(pass.groupBy("host").agg(count(lit(1)).as("n_pass")), Seq("host"), "left")
      .join(held.groupBy("host").agg(count(lit(1)).as("n_held")), Seq("host"), "left")
      .join(slots.select(col("host"), lit(true).as("robots_fetch")), Seq("host"), "left")
      .select(col("host"), col("age"), col("stale"),
        coalesce(col("n_pass"), lit(0L)).as("n_pass"),
        coalesce(col("n_held"), lit(0L)).as("n_held"),
        coalesce(col("robots_fetch"), lit(false)).as("robots_fetch"))
      .orderBy("host")
  }
}
