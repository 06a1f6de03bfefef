package graft.operators

import graft.functions.{GraftFunctions, ImageKit}
import graft.model._
import graft.sources.{Gen, SeenStore, Snapshots}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}

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

  /** Deterministic failure classes for the synthetic fetch (the network
    * would provide these for free; url_hash-seeded so resume re-runs are
    * bit-identical): ~1/64 of scheduled fetches time out, ~1/128 of fetched
    * pages fail to parse. Both counters in the lineage manifest are real
    * because of this — nothing is hardcoded to succeed.
    */
  def fetchFails(urlHash: Long, epoch: Int): Boolean =
    (ImageKit.mix64(urlHash ^ (epoch * 0xa5f1L + 0x5bd1L)) & 63L) == 0L

  def parseFails(urlHash: Long, epoch: Int): Boolean =
    (ImageKit.mix64(urlHash ^ (epoch * 0xc3b7L + 0x2e63L)) & 127L) == 0L

  /** The fetch-partition routing expression: `repartition(n, col)` routes
    * rows by murmur3-hash(col) mod n, and this column replicates it exactly
    * (`hash` IS Murmur3 with HashPartitioning's seed), so dedupe drops —
    * which never reach the wave — are attributable to the fetch partition
    * they would have landed in, and the lineage manifest's per-partition
    * counters all describe the same unit of work.
    */
  def fetchPartitionId(urlHash: Column, numPartitions: Int): Column =
    pmod(hash(urlHash), lit(numPartitions)).cast("int")

  /** The instrumented fetch wave (S5+S6): explicitly hash-partitioned on
    * url_hash (uniform per-task load even under hot-host skew; per-host
    * pacing is carried by scheduled_at_ms, not task order), one decode/
    * encode pass per row, per-row status + monotone per-task elapsed so the
    * lineage aggregation recovers true task wall times. Failure rows carry
    * null payloads — they cost bytes only in the fetch log, never in a
    * shuffle.
    */
  def fetchInstrumented(
      scheduled: Dataset[Scheduled],
      epoch: Int,
      numPartitions: Int): Dataset[Fetched] = {
    import scheduled.sparkSession.implicits._
    scheduled
      .repartition(numPartitions, col("url_hash"))
      .mapPartitions { it =>
        val t0 = System.nanoTime()
        val pid = org.apache.spark.TaskContext.getPartitionId()
        it.map { s =>
          val row =
            if (fetchFails(s.url_hash, epoch))
              Fetched(s.url_canon, null, 0, 0, null, null, 0L, epoch,
                pid, "fetch_failed", 0L)
            else if (parseFails(s.url_hash, epoch))
              Fetched(s.url_canon, null, 0, 0, null, null, 0L, epoch,
                pid, "parse_failed", 0L)
            else {
              val fmt = if ((s.url_hash & 1L) == 0L) "png" else "jpeg"
              val snap = Gen.snapshotRow(
                imageId = s.url_canon,
                variant = contentVariant(s.url_hash, epoch),
                captionVer = captionVariant(s.url_hash, epoch),
                fmt = fmt, epoch = epoch)
              Fetched(snap.image_id, snap.bytes, snap.w, snap.h, snap.fmt,
                snap.caption, snap.phash, epoch, pid, "parsed", 0L)
            }
          row.copy(elapsed_ms = (System.nanoTime() - t0) / 1000000L)
        }
      }
  }

  // ---- c67: fetched-payload validation wired into the pipeline --------

  /** Deterministic payload damage class for the synthetic fetch (the real
    * network supplies these for free; url_hash-seeded so resume re-runs
    * are bit-identical): ~1/32 of parsed pages arrive damaged — half
    * TRUNCATED mid-stream (connection cut before the container's
    * dimension field: both the c55 trailer audit and the c63 dims sniff
    * refuse it), half substituted by a half-size THUMBNAIL (a CDN/proxy
    * re-render: container whole, trailer intact, magic matches — ONLY
    * the c63 header-dims-vs-catalog gate can catch it).
    * 0 = clean, 1 = truncated, 2 = thumbnail.
    */
  def payloadDamage(urlHash: Long, epoch: Int): Int = {
    val m = ImageKit.mix64(urlHash ^ (epoch * 0x6d2bL + 0x3c97L))
    if ((m & 31L) != 0L) 0 else (1 + ((m >>> 8) & 1L)).toInt
  }

  /** c55+c63 wired end-to-end: the pre-decode admission gate a fetch
    * pipeline runs on every response — magic sniff vs declared format,
    * trailer intact, header dims == catalog dims — as ONE codegen
    * projection over the fetch wave (nothing decoded; the damage
    * injection above is the only per-row kernel work and models the
    * network, not the gate). Rows failing the gate flip to status
    * `invalid_payload` with a null payload: they are fetched-but-not-
    * parsed in the lineage manifest, never enter the parsed contract
    * view, the revisions diff, or the latest table — but their URL is
    * already in the seen store (the fetch happened; retry is recrawl
    * policy, not dedupe policy). Off by default: base goldens stay
    * byte-identical.
    */
  def validateFetched(fetched: Dataset[Fetched], epoch: Int): Dataset[Fetched] = {
    val spark = fetched.sparkSession
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val damaged = fetched.mapPartitions(_.map { r =>
      if (r.status != "parsed") r
      else payloadDamage(CrawlOracle.xxhash64(r.image_id), epoch) match {
        case 1 => r.copy(bytes = r.bytes.take(12))
        case 2 =>
          val (px, w, h) = ImageKit.decodeGray(r.bytes)
          val tw = math.max(1, w / 2); val th = math.max(1, h / 2)
          val tp = ImageKit.resampleArea(px, w, h, tw, th)
            .map(v => math.max(0, math.min(255, math.round(v).toInt)))
          r.copy(bytes = ImageKit.encode(tp, tw, th, r.fmt))
        case _ => r
      }
    })
    val declaredPacked =
      shiftleft(col("w").cast("long"), 32).bitwiseOR(col("h").cast("long"))
    val ok = FetchAudit.sniffedFmtCol(col("bytes")) === col("fmt") &&
      FetchAudit.trailerOkCol(col("bytes")) &&
      GraftFunctions.headerDims64(col("bytes")) === declaredPacked
    damaged.toDF()
      .withColumn("status",
        when(col("status") === "parsed" && !ok, "invalid_payload")
          .otherwise(col("status")))
      .withColumn("bytes",
        when(col("status") === "invalid_payload", lit(null).cast("binary"))
          .otherwise(col("bytes")))
      .as[Fetched]
  }

  /** c67 demo rows: a 2-epoch validated crawl's per-epoch status ledger —
    * the auditable record the admission gate leaves in the fetch log
    * (parsed / invalid_payload / fetch_failed / parse_failed counts).
    */
  def payloadGateDemo(spark: SparkSession): DataFrame = {
    val root = graft.SparkEnv.scratchDir("graft-c67demo")
    // trimmed demo scale (c44/c51 precedent): ~8 expected damage rows
    // per epoch at 1/32 — the ledger stays non-vacuous (all four statuses
    // realized per epoch, probed 8 rows) and the wall drops ~1 s; the
    // fixed 2-epoch crawl cost dominates, and the semantics are pinned at
    // full scale by ValidationPipelineSpec
    run(spark, root, untilEpoch = 1, seedsPerEpoch = 350,
      cfg0 = FrontierJob.Config(epoch = 0, globalBudget = 250,
        defaultHostBudget = 4, maxHostBudget = 4),
      payloadValidation = true)
    (0 to 1).map(e => Snapshots.readRaw(spark, root, e)
        .groupBy(lit(e).as("epoch"), col("status"))
        .agg(count(lit(1)).as("n")))
      .reduce(_ unionByName _)
      .orderBy("epoch", "status")
  }

  /** Synthetic outlink discovery (SURVEY.md §2.7 U1): each fetched page
    * links to a deterministic handful of other article URLs on its host.
    * With `crossHost` the LAST link of each fanout set instead targets a
    * deterministically chosen other host — the link pattern that gives
    * the crawl a real host graph (and g02 rank-ordered crawling something
    * to rank). Off by default: the base goldens stay byte-identical.
    */
  /** c44 demo: tight-budget epochs with priority aging on (boost 2.0 —
    * above the whole fresh-priority range, so one carryover round outranks
    * every new discovery); one row per scheduled URL with its
    * first-scheduled epoch and whether it arrived via an aged carryover.
    * AgingSpec contrasts this against an aging-off control, where URLs
    * below the outlink priority floor starve behind fresh discoveries.
    */
  /** c44 demo — 2 epochs (0..1) suffice for every row class: carryover is
    * written at epoch 0, boosted re-entries schedule at epoch 1, and the
    * 2.0 boost pushes any aged row past the was_aged threshold immediately
    * (so rows realize aged + un-aged + both first_epoch values); the
    * starvation-bound semantics are pinned by AgingSpec on its own longer
    * run, so the bench demo pays the ~40-action-per-epoch pipeline fixed
    * cost (see BENCH/PLANS.md) the minimum number of times.
    */
  def agingDemo(spark: SparkSession, epochs: Int = 1, seedsPerEpoch: Int = 400,
                budget: Int = 100): org.apache.spark.sql.DataFrame = {
    val root = graft.SparkEnv.scratchDir("graft-c44")
    run(spark, root, untilEpoch = epochs, seedsPerEpoch = seedsPerEpoch,
      cfg0 = FrontierJob.Config(epoch = 0, globalBudget = budget),
      aging = true, agingBoost = 2.0)
    val sched = (0 to epochs).map(e =>
      spark.read.parquet(s"$root/scheduled/epoch=$e")
        .select(col("url_hash"), col("host"), col("priority"))
        .withColumn("epoch", lit(e)))
      .reduce(_ unionByName _)
    sched.groupBy("url_hash", "host")
      .agg(min("epoch").as("first_epoch"), max("priority").as("max_priority"))
      .select(col("url_hash"), col("host"), col("first_epoch").cast("int").as("first_epoch"),
        (col("max_priority") >= 2.0).as("was_aged"))
      .orderBy("url_hash")
  }

  /** c83 demo rows: a 3-epoch retrying crawl's failure ledger — every URL
    * that ever failed transiently, with its last outcome and whether the
    * retry budget still covers it. fanout 0 + identical per-epoch seeds
    * make epochs 1..2 pure retry waves, so the ledger directly exhibits
    * fail→retry→recover and fail→retry→fail chains.
    */
  def retryDemo(spark: SparkSession, epochs: Int = 2,
                seedsPerEpoch: Int = 400, retryMax: Int = 2): DataFrame = {
    val root = graft.SparkEnv.scratchDir("graft-c83")
    run(spark, root, untilEpoch = epochs, seedsPerEpoch = seedsPerEpoch,
      cfg0 = FrontierJob.Config(epoch = 0, globalBudget = 10000),
      outlinkFanout = 0, retryFailures = true, retryMax = retryMax)
    RetryOps.retryLedger(spark, root, epochs, retryMax)
      .where(col("n_transient") >= 1)
      .orderBy("image_id")
  }

  def outlinks(scheduled: Dataset[Scheduled], fanout: Int,
               crossHost: Boolean = false): Dataset[Seed] = {
    import scheduled.sparkSession.implicits._
    scheduled.flatMap { s =>
      (0 until fanout).map { k =>
        val a = java.lang.Long.remainderUnsigned(ImageKit.mix64(s.url_hash ^ (k + 1L)), 100000L)
        val host =
          if (crossHost && k == fanout - 1) crossHostOf(s.url_hash, k)
          else s.host
        Seed(s"http://$host/news/linked/art-$a", 0.25)
      }
    }
  }

  /** The deterministic cross-host target of a page's last outlink —
    * one formula, used by outlink generation AND by host-edge recovery
    * from committed schedules (so the edge list never needs persisting).
    */
  def crossHostOf(urlHash: Long, k: Int): String =
    Gen.hostName(java.lang.Long.remainderUnsigned(
      ImageKit.mix64(urlHash ^ 0x9e3779b97f4a7c15L ^ (k + 1L)), Gen.NumHosts).toInt)

  /** (src_host, dst_host) edges implied by a committed schedule's
    * cross-host outlinks — regenerated from the same formula, self-loops
    * dropped, deduplicated. The host graph is tiny relative to the page
    * tables, so this is one narrow pass + a distinct.
    */
  def hostEdgesFromScheduled(scheduled: Dataset[Scheduled], fanout: Int): DataFrame = {
    import scheduled.sparkSession.implicits._
    scheduled.flatMap { s =>
      val dst = crossHostOf(s.url_hash, fanout - 1)
      if (dst != s.host) Some((s.host, dst)) else None
    }.toDF("src", "dst").distinct()
  }

  /** g02 — rank-boost outlink priorities: each outlink's priority gains
    * its DESTINATION host's PageRank (authority flows to what gets
    * linked). The rank table is host-sized — broadcast; the arithmetic
    * is one double add over 6dp-rounded ranks, so the single-threaded
    * mirror reproduces it bit-for-bit.
    */
  def rankBoosted(outs: Dataset[Seed], hostRanks: DataFrame): Dataset[Seed] = {
    import outs.sparkSession.implicits._
    GraftFunctions.ensureRegistered(outs.sparkSession)
    outs.toDF()
      .withColumn("host", GraftFunctions.hostOf(col("url")))
      .join(broadcast(hostRanks.select(col("node").as("host"), col("pagerank"))),
        Seq("host"), "left")
      .select(col("url"),
        (col("priority") + coalesce(col("pagerank"), lit(0.0))).as("priority"))
      .as[Seed]
  }

  /** Run epochs [latestCommitted+1, untilEpoch] over a seed generator;
    * resume-safe: re-invoking after a crash (or on a fresh session) picks
    * up from the manifest (E3).
    *
    * `sidecar` selects the seen-filter kind (north_rule "bloom/cuckoo"):
    * "bloom" (default) or "cuckoo" — the sidecar only pre-routes rows
    * around the exact anti-join, so the two runs are golden-equal on every
    * output table; cuckoo additionally supports O(1) deletion (e.g.
    * purging a host after a robots change) at ~2x the bytes per key.
    */
  def run(
      spark: SparkSession,
      root: String,
      untilEpoch: Int,
      seedsPerEpoch: Int,
      cfg0: FrontierJob.Config,
      numBuckets: Int = 16,
      outlinkFanout: Int = 2,
      fetchPartitions: Int = 32,
      sidecar: String = "bloom",
      sidecarPerBucket: Long = 0L,
      compactSeenEvery: Int = 8,
      retainEvery: Int = 0,
      retainWindow: Long = 4L,
      retainStride: Int = 3,
      backoff: Boolean = false,
      backoffThresholdBp: Int = 1500,
      byteBudgetPerHost: Long = 0L,
      recrawl: Boolean = false,
      recrawlPolicy: String = "staleness",
      revalidate: Boolean = false,
      rankOrdered: Boolean = false,
      sitemaps: Boolean = false,
      adaptivePacing: Boolean = false,
      aging: Boolean = false,
      agingBoost: Double = 0.25,
      robotsFlipEpoch: Int = -1,
      robotsAvailability: Boolean = false,
      payloadValidation: Boolean = false,
      retryFailures: Boolean = false,
      retryMax: Int = 2): Seq[EpochSummary] = {
    require(sidecar == "bloom" || sidecar == "cuckoo", s"unknown sidecar kind: $sidecar")
    require(recrawlPolicy == "staleness" || recrawlPolicy == "changerate",
      s"unknown recrawl policy: $recrawlPolicy")
    import spark.implicits._
    val start = Snapshots.latestCommittedEpoch(root) + 1
    // Size the epoch loop's shuffles to the FRONTIER, not the session
    // default, and drop AQE inside it (the GraphOps loop discipline): an
    // epoch's tables are bounded by seeds+outlinks+recrawl (~seedsPerEpoch
    // x (1+fanout) rows), every epoch action is evaluated eagerly in this
    // scope, and AQE's per-exchange stage materialization multiplied each
    // demo's job count ~3x for nothing it could improve at these sizes.
    // Values are partitioning-invariant (politeness windows and budgets
    // are fully ordered; fetch pids are hash-derived at a pinned width).
    // Conf restored after the loop; partitions never raised above the
    // session setting, so a production-sized frontier keeps full width.
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sessionAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val epochRows = seedsPerEpoch.toLong * (1L + math.max(0, outlinkFanout))
    val loopParts = math.max(1L,
      math.min(sessionParts.toLong, epochRows / 65536L + 1L)).toInt
    spark.conf.set("spark.sql.shuffle.partitions", loopParts)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try (start to untilEpoch).map { epoch =>
      val cfg = cfg0.copy(epoch = epoch, epochT0Ms = cfg0.epochT0Ms + epoch * 3600000L)
      // c29 wired end-to-end: sitemap discoveries enter at epoch 0 as
      // ordinary seeds (sitemap priority == seed priority) and take the
      // same canonicalize -> dedupe -> robots -> politeness path; later
      // epochs need no re-read because the synthetic catalog is static
      // (a real crawl re-reads on the sitemap's own change cadence).
      // Off by default: the base goldens stay byte-identical.
      val sitemapSeeds =
        if (sitemaps && epoch == 0)
          SitemapOps.asSeeds(SitemapOps.sitemapEntries(spark))
        else spark.emptyDataset[Seed]
      // c44 wired end-to-end: URLs that were eligible last epoch but lost
      // the budget race re-enter with their priority AGED upward, so a
      // low-priority URL cannot starve behind an endless stream of
      // higher-priority discoveries — after ceil((p_max - p)/agingBoost)
      // epochs it outranks every fresh seed (priorities are bounded).
      // Carryover duplicates of still-live seeds are harmless: the
      // canonicalize dedupe keeps max(priority), so the BOOSTED copy wins.
      // Off by default: the base goldens stay byte-identical.
      val agedCarryover =
        if (!aging || epoch == 0) spark.emptyDataset[Seed]
        else {
          val p = s"$root/carryover/epoch=${epoch - 1}"
          if (!new java.io.File(p).exists()) spark.emptyDataset[Seed]
          else spark.read.parquet(p).as[Seed]
        }
      val seeds = Gen.seeds(spark, seedsPerEpoch.toLong)
        .unionByName(sitemapSeeds)
        .unionByName(agedCarryover)
        .unionByName(
          if (epoch == 0) spark.emptyDataset[Seed]
          else {
            val prev = spark.read.parquet(s"$root/scheduled/epoch=${epoch - 1}")
              .select("url_canon", "url_hash", "host", "path", "priority",
                "slot", "scheduled_at_ms")
              .withColumn("epoch", lit(epoch - 1)).as[Scheduled]
            val outs = outlinks(prev, outlinkFanout, crossHost = rankOrdered)
            if (!rankOrdered) outs
            else {
              // g02 rank-ordered crawling: host authority computed from the
              // edges the crawl has ALREADY observed (all committed
              // schedules' cross-host outlinks, recovered by formula — no
              // persisted edge table), boosting each outlink by its
              // destination host's PageRank. New URLs on well-linked hosts
              // outrank link-farm spray when budgets contend.
              val past = (0 until epoch)
                .map(e => spark.read.parquet(s"$root/scheduled/epoch=$e")
                  .select("url_canon", "url_hash", "host", "path", "priority",
                    "slot", "scheduled_at_ms")
                  .withColumn("epoch", lit(e)).as[Scheduled])
                .reduce(_ unionByName _)
              val edges = hostEdgesFromScheduled(past, outlinkFanout)
              if (edges.isEmpty) outs
              else rankBoosted(outs, GraphOps.pageRank(spark, edges, iters = 5,
                damping = 0.85))
            }
          })
      val seen = SeenStore.load(spark, root)
      val sidecars =
        if (sidecar == "cuckoo") SeenStore.loadCuckoos(spark, root, epoch - 1)
        else SeenStore.loadBlooms(spark, root, epoch - 1)
      // c30/c32 wired end-to-end: epoch N schedules under delays learned
      // from epochs < N's observed fetch latencies (persisted mergeable
      // histograms — committed state, so resume re-learns identically);
      // robots' Crawl-delay stays the floor. Off by default: the base
      // goldens stay byte-identical.
      val robots = {
        // c59 wired: at robotsFlipEpoch the cache refreshes to the mutated
        // generation (policies open AND tighten); off by default so the
        // base goldens stay byte-identical
        val base =
          if (robotsFlipEpoch >= 0 && epoch >= robotsFlipEpoch)
            RobotsDiffOps.mutatedRobots(spark)
          else Gen.robots(spark)
        val base2 =
          if (!adaptivePacing || epoch == 0) base
          else PacingOps.withAdaptiveDelays(base,
            PacingOps.adaptiveDelaysFrom(spark, root, epoch - 1))
        // c62 wired: this epoch's robots-fetch outcome overrides the rules
        // per RFC 9309 — 4xx hosts open fully, freshly-5xx hosts park,
        // chronically-5xx hosts serve the cached copy. Pure column over
        // the host catalog; everything downstream (applyRobots, schedule)
        // is availability-blind. Off by default: base goldens stay
        // byte-identical.
        if (!robotsAvailability) base2
        else {
          import spark.implicits._
          base2.toDF().withColumn("rules",
            RobotsAvailabilityOps.effectiveRulesCol(col("rules"),
              RobotsAvailabilityOps.policyCol(col("host"), epoch, staleEpochs = 1)))
            .as[graft.model.RobotsEntry]
        }
      }
      // E1 staged explicitly (vs runEpoch) so the dedupe boundary is
      // observable for the lineage manifest: n_deduped = raw candidates
      // minus dedupe survivors, per fetch partition. Both sides are
      // count-only aggregations over short-lived cached url-level rows
      // (never bytes); the counts themselves are <= fetchPartitions rows.
      val pidCol = fetchPartitionId(col("url_hash"), fetchPartitions)
      val frontier = FrontierJob.canonicalizeFrontierCounted(seeds).persist()
      val deduped = (
        if (sidecar == "cuckoo")
          FrontierJob.dedupeAgainstSeenCuckoo(frontier.drop("n_raw"), seen, sidecars, numBuckets)
        else
          FrontierJob.dedupeAgainstSeen(frontier.drop("n_raw"), seen, sidecars, numBuckets)
        ).persist()
      // one action for both sides of the dedupe ledger (raw candidates and
      // survivors per fetch partition) — the former two collects were two
      // full job launches per epoch for <=fetchPartitions rows each
      val rawAndSurv = frontier
        .groupBy(pidCol.as("partition_id")).agg(sum("n_raw").as("n_raw"))
        .join(
          deduped.groupBy(pidCol.as("partition_id")).agg(count(lit(1)).as("n")),
          Seq("partition_id"), "full_outer")
        .as[(Int, Option[Long], Option[Long])].collect()
      val rawCounts = rawAndSurv
        .collect { case (pid, Some(raw), _) => pid -> raw }.toMap
      val survCounts = rawAndSurv
        .collect { case (pid, _, Some(n)) => pid -> n }.toMap
      val dedupeCounts = rawCounts.map { case (pid, raw) =>
        pid -> (raw - survCounts.getOrElse(pid, 0L))
      }.filter(_._2 > 0L)
      // recrawl mode (c25 wired end-to-end): articles DUE under the
      // backoff policy re-enter the frontier AROUND the seen-set dedupe
      // (re-fetching them is the point) but still pass robots + politeness
      // like any discovery — recrawls compete for the same host budgets.
      // image_id == url_canon (a canonicalization fixed point), so the
      // re-seeded rows re-hash identically. Committed revisions only:
      // resume recomputes the same due set. Articles whose last fetch
      // FAILED never reached the revisions table and are not retried here
      // (failure retry is a different policy from content revisit).
      val recrawlFrontier =
        if (!recrawl || epoch == 0) None
        else {
          val dirs = (0 until epoch).map(e => s"$root/revisions/epoch=$e")
            .filter(p => new java.io.File(p).exists())
          if (dirs.isEmpty) None
          else {
            // policy switch (c25 staleness backoff vs c45 change-rate
            // estimator) — both emit the same (image_id, due, priority)
            // contract, so everything downstream is policy-blind
            val revs = spark.read.parquet(dirs: _*)
            val sched =
              if (recrawlPolicy == "changerate")
                DiffJob.recrawlScheduleChangeRate(revs, atEpoch = epoch)
              else DiffJob.recrawlSchedule(revs, atEpoch = epoch)
            // c51 wired end-to-end: due pages whose validator (ETag analog
            // — the content/caption variant pair of the last fetch) still
            // matches the server's are 304s — dropped here, BEFORE robots/
            // politeness, so their budget goes to pages that changed. The
            // validator changes exactly when content does, so no revision
            // is ever lost (RevalidationSpec). Off by default: the base
            // recrawl goldens stay byte-identical.
            val due0 = sched.where(col("due"))
            val due =
              if (!revalidate) due0
              else RevalidationOps.withRevalidation(due0, epoch)
                .where(!col("not_modified"))
            Some(FrontierJob.canonicalizeFrontier(
              due.select(col("image_id").as("url"), col("priority"))
                .as[Seed]))
          }
        }
      // c83 wired end-to-end: URLs whose LAST attempt failed transiently
      // (fetch_failed / c67 invalid_payload) re-enter the frontier with a
      // bounded attempt budget — like recrawl they bypass the seen dedupe
      // (they ARE seen; refetching is the point) but pass robots +
      // politeness like any discovery. parse_failed is permanent (the
      // parser is deterministic — c83 scaladoc). Committed state only, so
      // resume recomputes the same due set. Off by default: base goldens
      // stay byte-identical.
      val retryFrontier =
        if (!retryFailures || epoch == 0) None
        else {
          val canon = FrontierJob.canonicalizeFrontier(
            RetryOps.dueForRetry(spark, root, epoch - 1, retryMax)
              .select(col("url"), col("priority")).as[Seed])
          // a URL due under BOTH recrawl (content revisit) and retry (a
          // scheduled recrawl that then failed) schedules once: the retry
          // copy yields
          Some(recrawlFrontier.fold(canon)(rc =>
            canon.join(rc.select("url_hash"), Seq("url_hash"), "left_anti")))
        }
      val toRobots0 = Seq(recrawlFrontier, retryFrontier).flatten
        .foldLeft(deduped)(_ unionByName _)
      // c59 wired end-to-end: exactly at the flip epoch, URLs held back
      // under the OLD policy in earlier epochs re-enter the frontier if
      // the NEW policy allows them (once — later epochs hold nothing under
      // the old generation). Re-enqueues are anti-joined against this
      // epoch's natural frontier so a re-seeded URL is not doubled; they
      // were never scheduled, so they cannot be in the seen store.
      val toRobots =
        if (robotsFlipEpoch < 0 || epoch != robotsFlipEpoch) toRobots0
        else {
          val dirs = (0 until epoch).map(e => s"$root/robots_held/epoch=$e")
            .filter(p => new java.io.File(p).exists())
          if (dirs.isEmpty) toRobots0
          else {
            val re = RobotsDiffOps.newlyAllowed(
                spark.read.parquet(dirs: _*),
                Gen.robots(spark).toDF(),
                RobotsDiffOps.mutatedRobots(spark).toDF())
              .join(toRobots0.select("url_hash"), Seq("url_hash"), "left_anti")
            toRobots0.unionByName(re)
          }
        }
      // persist this epoch's robots-rejected rows (sibling-state: written
      // before the manifest commit, overwrite-idempotent) so a future flip
      // can re-gate them; only when the feature is on
      if (robotsFlipEpoch >= 0) {
        toRobots
          .join(broadcast(robots.toDF().select(col("host"), col("rules"))), Seq("host"))
          .where(!FrontierJob.robotsAllowedCol(col("rules"), col("path")))
          .select("url_canon", "url_hash", "host", "path", "priority")
          .write.mode("overwrite").parquet(s"$root/robots_held/epoch=$epoch")
      }
      val allowed0 = FrontierJob.applyRobots(toRobots, robots, cfg)
      // c50 wired end-to-end: budgets of hosts that failed above threshold
      // last epoch shrink by the committed AIMD multiplier (floor 1 — a
      // sick host is slowed, never starved; clean epochs regrow it). The
      // multiplier only shrinks budgets, so the politeness top-K bound
      // (maxHostBudget) needs no re-sizing. Off by default: base goldens
      // stay byte-identical.
      val allowed1 =
        if (!backoff || epoch == 0) allowed0
        else BackoffOps.loadState(spark, root, epoch - 1)
          .fold(allowed0)(BackoffOps.applyBackoff(allowed0, _))
      // c54 wired end-to-end: per-host request budgets shrink to fit a
      // byte allowance using mean page sizes learned from committed
      // epochs (shrink-only, like backoff — the top-K bound stands; hosts
      // with no history keep their budget so first contact can measure).
      // Off by default: the base goldens stay byte-identical.
      val allowed =
        if (byteBudgetPerHost <= 0L || epoch == 0) allowed1
        else BandwidthOps.applyByteBudget(allowed1,
          BandwidthOps.hostByteStats(spark, root, epoch - 1), byteBudgetPerHost)
      val scheduled = FrontierJob
        .applyGlobalBudget(FrontierJob.schedule(allowed, cfg), cfg)
        .persist()
      scheduled.write.mode("overwrite").parquet(s"$root/scheduled/epoch=$epoch")
      // c44: persist the budget-losers with aged priority BEFORE the
      // manifest commit (sibling-state discipline: a crash re-runs the
      // epoch and overwrites idempotently). The carryover is at most the
      // eligible-minus-budget fraction of the epoch — frontier-sized worst
      // case, epoch-budget-sized typically — and carries (url, priority)
      // only.
      if (aging) {
        allowed.join(scheduled.toDF().select("url_hash"), Seq("url_hash"), "left_anti")
          .select(col("url_canon").as("url"),
            (col("priority") + lit(agingBoost)).as("priority"))
          .write.mode("overwrite").parquet(s"$root/carryover/epoch=$epoch")
      }
      frontier.unpersist()
      deduped.unpersist()
      // counted here (off the persisted df — same single action as before,
      // moved ahead of the fetch) so the snapshot write can size its output
      // files from the epoch's actual row count (guide §6)
      val nScheduled = scheduled.count()
      // target ~32k snapshot rows per output file; when the epoch is big
      // enough that the wave's own partitioning already meets the target,
      // pass 0 (no rebalance) so a full-scale epoch never pays an extra
      // payload exchange just to re-bin files it would emit anyway
      val snapshotWriteParts = {
        val target = math.max(1L,
          math.min(fetchPartitions.toLong, nScheduled / 32768L + 1L)).toInt
        if (target >= fetchPartitions) 0 else target
      }
      // fetch + snapshot data write (NOT yet committed — the manifest goes
      // last, after every piece of this epoch's state is at rest, so a
      // crash at ANY point here leaves an uncommitted epoch that resume
      // re-runs idempotently; committing before seen/blooms would instead
      // let a crash produce a committed epoch whose URLs re-schedule)
      val fetched0 = fetchInstrumented(scheduled, epoch, fetchPartitions)
      // c67: the payload admission gate sits between the fetch wave and
      // the at-rest write — damaged payloads land in the fetch log as
      // invalid_payload (auditable), never in the parsed contract view
      val fetched =
        if (!payloadValidation) fetched0 else validateFetched(fetched0, epoch)
      val summary = Snapshots.writeEpochFetched(fetched, root, epoch, dedupeCounts,
        writePartitions = snapshotWriteParts)
      // c50: persist this epoch's AIMD backoff state from the at-rest fetch
      // log BEFORE the manifest commit (sibling-state discipline — resume
      // recomputes it idempotently from the same committed rows)
      if (backoff)
        BackoffOps.writeState(spark, root, epoch,
          Snapshots.readRaw(spark, root, epoch).select("image_id", "status"),
          backoffThresholdBp)
      // adaptive pacing: persist this epoch's latency histogram partial
      // BEFORE the manifest commit (sibling-state discipline — a crash
      // re-runs the epoch and overwrites it idempotently); the kernel is
      // url_hash-seeded so the observations are resume-stable
      if (adaptivePacing) {
        val lat = scheduled
          .select(col("host"), col("url_hash")).as[(String, Long)]
          .map { case (host, h) =>
            (host, PacingOps.fetchLatencyMs(h, epoch, PacingOps.isSlowHost(host)))
          }.toDF("host", "latency_ms")
        PacingOps.writeLatencyEpoch(lat, root, epoch)
      }
      // seen merge + cumulative bloom sidecar for the NEXT epoch
      val newSeen0 = scheduled
        .select(col("url_hash"), col("host"), lit(epoch).as("first_epoch"))
      // recrawled/retried URLs are already in the seen store — re-appending
      // them would duplicate SeenEntry rows (double-inserting their cuckoo
      // fingerprints, wasting bucket capacity every revisit); the anti-join
      // runs only when a seen-bypass mode is on so the default path stays
      // byte-identical
      val newSeen = (
        if (recrawl || retryFailures)
          newSeen0.join(seen.toDF().select("url_hash"), Seq("url_hash"), "left_anti")
        else newSeen0
        ).as[SeenEntry]
      SeenStore.append(newSeen, root, epoch)
      val perBucket =
        if (sidecarPerBucket > 0L) sidecarPerBucket
        else math.max(1024L, seedsPerEpoch.toLong)
      if (sidecar == "cuckoo") {
        import graft.functions.Cuckoo64
        // Per-epoch tables MUST share the loaded cumulative sidecar's table
        // shape: fingerprint re-seating is only defined between equal
        // bucket counts (a stored index is hash & mask — positions in a
        // differently-masked table are not derivable), so after a
        // saturation rebuild has grown the persisted tables, new epochs
        // build at the grown shape, not the seed capacity. Building at
        // perBucket here would throw "cuckoo shape mismatch" on the first
        // post-rebuild merge.
        val loadedShape =
          if (sidecars.isEmpty) 0
          else sidecars.valuesIterator.map(Cuckoo64.tableBucketsOf).max
        val epochCuckoos =
          SeenStore.buildCuckoos(newSeen, numBuckets, perBucket, loadedShape)
            .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
        var merged = SeenStore.mergeCuckooMaps(sidecars, epochCuckoos)
        // The merge accumulates every epoch's URLs into a fixed-capacity
        // table; once a bucket saturates its overflow flag makes every
        // probe answer "maybe" — correct (rows route to the exact
        // anti-join) but the sidecar benefit silently vanishes. Make
        // saturation observable AND self-healing: rebuild from the full
        // seen set at a larger shape, sized on the OBSERVED max per-bucket
        // occupancy — buckets are host-keyed over a Zipf-skewed host set,
        // so the saturated bucket can sit far above total/numBuckets and
        // an average-sized rebuild may re-saturate immediately (repeating
        // the O(total-seen) rebuild every epoch for nothing).
        def overflowedIn(m: Map[Int, Array[Byte]]): Seq[Int] =
          m.filter { case (_, bytes) =>
            Cuckoo64.isOverflowed(Cuckoo64.deserialize(bytes))
          }.keys.toSeq.sorted
        var overflowed = overflowedIn(merged)
        if (overflowed.nonEmpty) {
          // committed epochs + THIS epoch's (not-yet-committed) entries —
          // a rebuild that missed newSeen would give those URLs a false
          // "definitely fresh" next epoch, skipping the exact anti-join
          val allSeen = SeenStore.load(spark, root).union(newSeen)
          val perBucketCounts = allSeen
            .groupBy(SeenStore.bucketOf(col("host"), numBuckets).as("hb"))
            .agg(count(lit(1)).as("n")).as[(Int, Long)].collect()
          val total = perBucketCounts.map(_._2).sum
          val maxPer = perBucketCounts.map(_._2).max
          val curShape = math.max(loadedShape, Cuckoo64.numBucketsFor(perBucket))
          // 25% headroom over the fullest bucket, and at least double the
          // current shape (geometric growth bounds total rebuild work over
          // the crawl's lifetime to O(final-seen-set))
          var shape = math.max(
            Cuckoo64.numBucketsFor(maxPer + maxPer / 4), 2 * curShape)
          var attempt = 0
          while (overflowed.nonEmpty && attempt < 3) {
            System.err.println(s"[graft] cuckoo sidecar saturated in buckets " +
              s"${overflowed.mkString(",")} at epoch $epoch — rebuilding from " +
              s"$total seen URLs (max $maxPer/bucket) at $shape table buckets")
            merged = SeenStore.buildCuckoos(allSeen, numBuckets, perBucket, shape)
              .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
            overflowed = overflowedIn(merged)
            if (overflowed.nonEmpty) { shape *= 2; attempt += 1 }
          }
          if (overflowed.nonEmpty)
            System.err.println(s"[graft] cuckoo sidecar healing FAILED at epoch " +
              s"$epoch: buckets ${overflowed.mkString(",")} still saturated — " +
              s"their rows route to the exact anti-join (correct, unaided)")
        }
        merged.toSeq.toDF("host_bucket", "cuckoo")
          .coalesce(1).write.mode("overwrite").parquet(s"$root/cuckoo/epoch=$epoch")
      } else {
        val epochBlooms = SeenStore.buildBlooms(newSeen, numBuckets, perBucket)
          .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
        SeenStore.mergeBloomMaps(sidecars, epochBlooms).toSeq.toDF("host_bucket", "bloom")
          .coalesce(1).write.mode("overwrite").parquet(s"$root/bloom/epoch=$epoch")
      }
      // E2 diff for this epoch against the maintained latest-version table
      // (flat per-epoch cost — the full-history window form would grow
      // O(total snapshots) per epoch; equality golden-tested in
      // DiffAndPipelineSpec)
      val revs = DiffJob.revisionsFromLatest(
        Snapshots.read(spark, root, epoch),
        Snapshots.readLatest(spark, root, epoch - 1),
        epoch, cfg.phashTau)
      revs.write.mode("overwrite").parquet(s"$root/revisions/epoch=$epoch")
      // c59 wired (the tightening direction): at the flip epoch, rows
      // fetched under the OLD policy whose path the NEW generation
      // disallows purge from the maintained latest table — news-diff's
      // user-facing delete / stop-serving action. The purge list persists
      // FIRST and the exclusion reads it back from rest, so a crash
      // anywhere re-runs idempotently (purge list is a pure function of
      // committed latest(e-1) + the two static generations). Later epochs
      // need no re-purge: readLatest chains from the purged table, and the
      // new policy gates any refetch.
      if (robotsFlipEpoch >= 0 && epoch == robotsFlipEpoch) {
        RobotsDiffOps.purgeList(
            Snapshots.readLatest(spark, root, epoch - 1),
            Gen.robots(spark).toDF(),
            RobotsDiffOps.mutatedRobots(spark).toDF())
          .write.mode("overwrite").parquet(s"$root/robots_purged/epoch=$epoch")
        Snapshots.writeLatest(spark, root, epoch,
          Some(spark.read.parquet(s"$root/robots_purged/epoch=$epoch")))
      } else Snapshots.writeLatest(spark, root, epoch)
      val nRevised = spark.read.parquet(s"$root/revisions/epoch=$epoch")
        .where(col("change").startsWith("revised")).count()
      scheduled.unpersist()
      // the atomic commit point: everything above is now at rest
      Snapshots.commitManifest(root, epoch, summary.n_rows, summary.n_partitions)
      // periodic seen-store compaction AFTER the commit (its input is then
      // fully committed; a crash mid-compaction leaves no _SUCCESS and the
      // next load falls back to the previous compact + a longer tail)
      if (compactSeenEvery > 0 && (epoch + 1) % compactSeenEvery == 0)
        SeenStore.compact(spark, root, epoch)
      // periodic version-chain retention (c48) under the same post-commit
      // discipline; off by default so the base goldens stay byte-identical
      if (retainEvery > 0 && (epoch + 1) % retainEvery == 0)
        RetentionOps.retainHistory(spark, root, epoch, retainWindow, retainStride)
      EpochSummary(epoch, nScheduled, nScheduled, nRevised)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", sessionParts)
      spark.conf.set("spark.sql.adaptive.enabled", sessionAqe)
    }
  }
}
