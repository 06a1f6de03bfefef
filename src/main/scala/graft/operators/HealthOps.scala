package graft.operators

import graft.functions.GraftFunctions
import graft.sources.Snapshots
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** c85 — per-host CRAWL HEALTH ledger over committed state: the ops
  * dashboard a crawl operator reads before touching budgets — fetch
  * outcomes (parsed / transport-failed / parse-failed, failure basis
  * points) joined with content dynamics (revision basis points among
  * parsed fetches) per host across all committed epochs. Everything
  * derives from at-rest tables (fetch logs + revisions), so the ledger is
  * resume-stable and costs two status-column scans + one broadcast-sized
  * join at |hosts| rows — payload bytes are never read (parquet pruning).
  *
  * The gate is a real cross-check, not a mirror of the same code path:
  * fetch statuses are kernel-determined from (url_hash, epoch), so the
  * spec predicts every per-host count from the SCHEDULED tables + the
  * fetch kernels and compares against what the fetch LOGS say — a drift
  * between schedule and log (lost rows, double fetches, misattributed
  * failures) fails the ledger even though both sides are "committed".
  */
object HealthOps {

  def hostHealth(spark: SparkSession, root: String, uptoEpoch: Int): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val logs = (0 to uptoEpoch).map(e =>
        Snapshots.readRaw(spark, root, e).select(col("image_id"), col("status")))
      .reduce(_ unionByName _)
      .withColumn("host", GraftFunctions.hostOf(col("image_id")))
    val fetch = logs.groupBy("host").agg(
      count(lit(1)).as("n_fetched"),
      sum(when(col("status") === "parsed", 1L).otherwise(0L)).as("n_parsed"),
      sum(when(col("status") === "fetch_failed", 1L).otherwise(0L))
        .as("n_fetch_failed"),
      sum(when(col("status") === "parse_failed", 1L).otherwise(0L))
        .as("n_parse_failed"))
    val revDirs = (0 to uptoEpoch)
      .map(e => s"$root/revisions/epoch=$e")
      .filter(p => new java.io.File(p).exists())
    val revs =
      if (revDirs.isEmpty)
        fetch.select(col("host")).limit(0).withColumn("n_revised", lit(0L))
      else
        spark.read.parquet(revDirs: _*)
          .where(col("change").startsWith("revised"))
          .withColumn("host", GraftFunctions.hostOf(col("image_id")))
          .groupBy("host").agg(count(lit(1)).as("n_revised"))
    fetch.join(revs, Seq("host"), "left")
      .select(col("host"), col("n_fetched"), col("n_parsed"),
        col("n_fetch_failed"), col("n_parse_failed"),
        coalesce(col("n_revised"), lit(0L)).as("n_revised"),
        expr("(n_fetch_failed + n_parse_failed) * 10000 div n_fetched")
          .as("failure_bp"),
        when(col("n_parsed") === 0L, lit(0L))
          .otherwise(expr("coalesce(n_revised, 0) * 10000 div n_parsed"))
          .as("revision_bp"))
      .orderBy("host")
  }

  /** c85 demo rows: a 3-epoch crawl's health ledger (every host present,
    * failures realized by the 1/64 + 1/128 kernels).
    */
  def hostHealthDemo(spark: SparkSession, epochs: Int = 2,
                     seedsPerEpoch: Int = 500): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-c85").toString
    CrawlPipeline.run(spark, root, untilEpoch = epochs,
      seedsPerEpoch = seedsPerEpoch,
      cfg0 = FrontierJob.Config(epoch = 0, globalBudget = 10000),
      recrawl = true)
    hostHealth(spark, root, epochs)
  }
}
