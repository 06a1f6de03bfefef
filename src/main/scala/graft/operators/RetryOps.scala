package graft.operators

import graft.sources.Snapshots
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** c83 — FAILURE-RETRY policy: URLs whose LAST fetch attempt failed in a
  * TRANSIENT way re-enter the frontier with a bounded attempt budget.
  * This is the policy CrawlPipeline's recrawl path explicitly does not
  * cover ("failure retry is a different policy from content revisit"):
  * c25/c45 revisit pages that PARSED to catch revisions; this retries
  * pages that never yielded content at all.
  *
  * Transient = `fetch_failed` (network timeout) and `invalid_payload`
  * (c67's damaged-in-transit admission reject) — a refetch can succeed.
  * `parse_failed` is PERMANENT: the parser is deterministic, so refetching
  * the same bytes cannot help; those URLs wait for a parser change, not a
  * retry budget (the reference's per-site parsers behave the same way —
  * a broken selector fails every fetch until the parser is fixed).
  *
  * Scale shape: the ledger is one map-side-combined groupBy over the
  * committed fetch logs' (image_id, status, epoch) columns — parquet
  * column pruning keeps payload bytes unread — and the due set is a
  * dup-rate-sized fraction of it. Everything derives from committed
  * epochs only, so resume recomputes the identical due set (the c25
  * discipline).
  */
object RetryOps {

  private val Transient = Seq("fetch_failed", "invalid_payload")

  /** Per-URL outcome ledger over any (image_id, status, epoch) fetch log:
    * last attempt epoch + status, transient-failure count, and the retry
    * verdict under `maxRetries`. Pure function of the log — the unit the
    * single-threaded spec mirror replays.
    */
  def retryLedgerOf(logs: DataFrame, maxRetries: Int): DataFrame =
    logs.groupBy("image_id")
      .agg(
        max("epoch").as("last_epoch"),
        max_by(col("status"), col("epoch")).as("last_status"),
        sum(when(col("status").isin(Transient: _*), 1L).otherwise(0L))
          .as("n_transient"))
      .withColumn("due",
        col("last_status").isin(Transient: _*) &&
          col("n_transient") <= maxRetries)

  /** The ledger over committed epochs [0, uptoEpoch]. */
  def retryLedger(spark: SparkSession, root: String, uptoEpoch: Int,
                  maxRetries: Int): DataFrame =
    retryLedgerOf(
      (0 to uptoEpoch).map(e =>
        Snapshots.readRaw(spark, root, e)
          .select(col("image_id"), col("status"), col("epoch")))
        .reduce(_ unionByName _),
      maxRetries)

  /** Due-for-retry URLs with their retry priority (below fresh-seed range
    * so retries never crowd out discovery under a tight budget; the
    * attempt number rides along for the ledger/fetch-log).
    */
  def dueForRetry(spark: SparkSession, root: String, uptoEpoch: Int,
                  maxRetries: Int, priority: Double = 0.3): DataFrame =
    retryLedger(spark, root, uptoEpoch, maxRetries)
      .where(col("due"))
      .select(col("image_id").as("url"), lit(priority).as("priority"),
        col("n_transient").as("attempt"))
}
