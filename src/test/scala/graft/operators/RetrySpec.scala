package graft.operators

import graft.SparkTestBase.spark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** c83 failure retry: the ledger law on planted logs, and the pipeline law
  * on a real multi-epoch crawl — with fanout 0 and identical per-epoch
  * seeds every epoch >= 1 is a PURE retry wave, so the scheduled set must
  * equal the kernel-predicted due set exactly, and the retryMax bound must
  * cut the wave off.
  */
class RetrySpec extends AnyFunSuite {
  import spark.implicits._

  test("ledger law on planted outcome chains") {
    val logs = Seq(
      // fail -> fail -> ok: recovered, not due
      ("u_recovered", "fetch_failed", 0), ("u_recovered", "fetch_failed", 1),
      ("u_recovered", "parsed", 2),
      // three straight transient failures: past maxRetries=2, not due
      ("u_exhausted", "fetch_failed", 0), ("u_exhausted", "invalid_payload", 1),
      ("u_exhausted", "fetch_failed", 2),
      // one failure, latest: due
      ("u_due", "fetch_failed", 2),
      // ok only: not due
      ("u_clean", "parsed", 0),
      // parse failure is permanent: not due
      ("u_parsebug", "parse_failed", 2),
      // failed once long ago, then parsed: not due
      ("u_healed", "invalid_payload", 0), ("u_healed", "parsed", 1))
      .toDF("image_id", "status", "epoch")
    val ledger = RetryOps.retryLedgerOf(logs, maxRetries = 2).collect()
      .map(r => r.getString(0) -> (r.getString(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(ledger("u_recovered") == (("parsed", 2L, false)))
    assert(ledger("u_exhausted") == (("fetch_failed", 3L, false)))
    assert(ledger("u_due") == (("fetch_failed", 1L, true)))
    assert(ledger("u_clean") == (("parsed", 0L, false)))
    assert(ledger("u_parsebug") == (("parse_failed", 0L, false)))
    assert(ledger("u_healed") == (("parsed", 1L, false)))
  }

  private def scheduledHashes(root: String, epoch: Int): Set[Long] =
    spark.read.parquet(s"$root/scheduled/epoch=$epoch")
      .select("url_hash").collect().map(_.getLong(0)).toSet

  test("pipeline law: retry waves == kernel-predicted due sets; bound cuts off") {
    val root = graft.SparkTestBase.tempDir("graft-retry")
    CrawlPipeline.run(spark, root, untilEpoch = 2, seedsPerEpoch = 300,
      cfg0 = FrontierJob.Config(epoch = 0, globalBudget = 10000),
      outlinkFanout = 0, retryFailures = true, retryMax = 2)
    val e0 = spark.read.parquet(s"$root/scheduled/epoch=0")
      .select("url_hash").collect().map(_.getLong(0)).toSet
    assert(e0.nonEmpty)
    // epoch 1 = exactly the epoch-0 transient failures (same seeds dedupe
    // away; fanout 0 adds nothing; every retry already passed robots and
    // budgets are loose)
    val due1 = e0.filter(h => CrawlPipeline.fetchFails(h, 0))
    assert(due1.nonEmpty, "fixture must plant epoch-0 failures")
    assert(scheduledHashes(root, 1) == due1)
    // epoch 2 = the epoch-1 wave that failed AGAIN (n_transient=2 <= 2)
    val due2 = due1.filter(h => CrawlPipeline.fetchFails(h, 1))
    assert(scheduledHashes(root, 2) == due2)
    // ledger agrees: a recovered URL is last_status=parsed and not due
    val ledger = RetryOps.retryLedger(spark, root, 2, 2)
      .where(col("n_transient") >= 1).collect()
      .map(r => (r.getString(0), r.getString(2), r.getBoolean(4)))
    val recovered = ledger.filter(_._2 == "parsed")
    assert(recovered.nonEmpty)
    assert(recovered.forall(!_._3))
  }

  test("retryMax=0 disables every retry wave (control equivalence)") {
    val root = graft.SparkTestBase.tempDir("graft-retry0")
    CrawlPipeline.run(spark, root, untilEpoch = 1, seedsPerEpoch = 300,
      cfg0 = FrontierJob.Config(epoch = 0, globalBudget = 10000),
      outlinkFanout = 0, retryFailures = true, retryMax = 0)
    // n_transient of a failed URL is already 1 > 0, so nothing is due and
    // with identical seeds + fanout 0 the epoch-1 schedule is empty
    assert(scheduledHashes(root, 1).isEmpty)
  }
}
