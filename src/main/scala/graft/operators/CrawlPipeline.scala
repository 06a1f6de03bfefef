package graft.operators

import graft.functions.ImageKit
import graft.model._
import graft.sources.{Gen, SeenStore, Snapshots}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Dataset, SparkSession}

/** The multi-epoch crawl driver: E1 frontier -> synthetic fetch -> snapshot
  * commit -> seen-store merge -> E2 diff, resumable from the last committed
  * manifest (SURVEY.md §3; north_rule "each crawl epoch is resumable from
  * ... snapshot checkpoints with per-partition lineage and fetch/parse
  * metrics").
  */
object CrawlPipeline {

  final case class EpochSummary(
      epoch: Int,
      n_scheduled: Long,
      n_new_seen: Long,
      n_revised: Long)

  /** Deterministic "fetch": the sandbox has no network (SURVEY.md §2.1 S5),
    * so content is a pure function of (url_hash, epoch). Revision script:
    * ~1/8 of pages get a pixel revision at any given epoch, ~1/16 a caption
    * revision — variant counters accumulate so history is consistent.
    */
  def contentVariant(urlHash: Long, epoch: Int): Int = {
    var v = 0
    var e = 1
    while (e <= epoch) {
      if ((ImageKit.mix64(urlHash ^ (e * 0x9e37L)) & 0x7) == 0) v += 1
      e += 1
    }
    v
  }

  def captionVariant(urlHash: Long, epoch: Int): Int = {
    var v = 0
    var e = 1
    while (e <= epoch) {
      if ((ImageKit.mix64(urlHash ^ (e * 0x51edL)) & 0xf) == 0) v += 1
      e += 1
    }
    v
  }

  def fetch(scheduled: Dataset[Scheduled], epoch: Int): Dataset[Snapshot] = {
    import scheduled.sparkSession.implicits._
    scheduled.mapPartitions(_.map { s =>
      val fmt = if ((s.url_hash & 1L) == 0L) "png" else "jpeg"
      Gen.snapshotRow(
        imageId = s.url_canon,
        variant = contentVariant(s.url_hash, epoch),
        captionVer = captionVariant(s.url_hash, epoch),
        fmt = fmt, epoch = epoch)
    })
  }

  /** Synthetic outlink discovery (SURVEY.md §2.7 U1): each fetched page
    * links to a deterministic handful of other article URLs on its host.
    */
  def outlinks(scheduled: Dataset[Scheduled], fanout: Int): Dataset[Seed] = {
    import scheduled.sparkSession.implicits._
    scheduled.flatMap { s =>
      (0 until fanout).map { k =>
        val a = java.lang.Long.remainderUnsigned(ImageKit.mix64(s.url_hash ^ (k + 1L)), 100000L)
        Seed(s"http://${s.host}/news/linked/art-$a", 0.25)
      }
    }
  }

  /** Run epochs [latestCommitted+1, untilEpoch] over a seed generator;
    * resume-safe: re-invoking after a crash (or on a fresh session) picks
    * up from the manifest (E3).
    */
  def run(
      spark: SparkSession,
      root: String,
      untilEpoch: Int,
      seedsPerEpoch: Int,
      cfg0: FrontierJob.Config,
      numBuckets: Int = 16,
      outlinkFanout: Int = 2): Seq[EpochSummary] = {
    import spark.implicits._
    val start = Snapshots.latestCommittedEpoch(root) + 1
    (start to untilEpoch).map { epoch =>
      val cfg = cfg0.copy(epoch = epoch, epochT0Ms = cfg0.epochT0Ms + epoch * 3600000L)
      val seeds = Gen.seeds(spark, seedsPerEpoch.toLong)
        .unionByName(
          if (epoch == 0) spark.emptyDataset[Seed]
          else {
            val prev = spark.read.parquet(s"$root/scheduled/epoch=${epoch - 1}")
              .select("url_canon", "url_hash", "host", "path", "priority",
                "slot", "scheduled_at_ms")
              .withColumn("epoch", lit(epoch - 1)).as[Scheduled]
            outlinks(prev, outlinkFanout)
          })
      val seen = SeenStore.load(spark, root)
      val blooms = SeenStore.loadBlooms(spark, root, epoch - 1)
      val robots = Gen.robots(spark)
      val scheduled = FrontierJob.runEpoch(seeds, robots, seen, blooms, numBuckets, cfg)
        .persist()
      scheduled.write.mode("overwrite").parquet(s"$root/scheduled/epoch=$epoch")
      // fetch + snapshot data write (NOT yet committed — the manifest goes
      // last, after every piece of this epoch's state is at rest, so a
      // crash at ANY point here leaves an uncommitted epoch that resume
      // re-runs idempotently; committing before seen/blooms would instead
      // let a crash produce a committed epoch whose URLs re-schedule)
      val snaps = fetch(scheduled, epoch)
      val summary = Snapshots.writeEpoch(snaps, root, epoch)
      // seen merge + cumulative bloom sidecar for the NEXT epoch
      val newSeen = scheduled
        .select(col("url_hash"), col("host"), lit(epoch).as("first_epoch"))
        .as[SeenEntry]
      SeenStore.append(newSeen, root, epoch)
      val epochBlooms = SeenStore
        .buildBlooms(newSeen, numBuckets, expectedPerBucket = math.max(1024L, seedsPerEpoch.toLong))
        .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
      val merged = SeenStore.mergeBloomMaps(blooms, epochBlooms)
      merged.toSeq.toDF("host_bucket", "bloom")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/bloom/epoch=$epoch")
      // E2 diff for this epoch against the maintained latest-version table
      // (flat per-epoch cost — the full-history window form would grow
      // O(total snapshots) per epoch; equality golden-tested in
      // DiffAndPipelineSpec)
      val revs = DiffJob.revisionsFromLatest(
        Snapshots.read(spark, root, epoch),
        Snapshots.readLatest(spark, root, epoch - 1),
        epoch, cfg.phashTau)
      revs.write.mode("overwrite").parquet(s"$root/revisions/epoch=$epoch")
      Snapshots.writeLatest(spark, root, epoch)
      val nRevised = spark.read.parquet(s"$root/revisions/epoch=$epoch")
        .where(col("change").startsWith("revised")).count()
      val nScheduled = scheduled.count()
      scheduled.unpersist()
      // the atomic commit point: everything above is now at rest
      Snapshots.commitManifest(root, epoch, summary.n_rows, summary.n_partitions)
      EpochSummary(epoch, nScheduled, nScheduled, nRevised)
    }
  }
}
