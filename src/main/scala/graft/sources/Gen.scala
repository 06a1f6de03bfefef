package graft.sources

import graft.functions.{ImageKit, MediaKit}
import graft.model._
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic data generators (FIXTURES.md §B; driver
  * instruction: "synthesise it deterministically at small scale ... no
  * external data").
  *
  * Every row is a pure function of (GenSeed, row index): the SAME formula
  * backs the local (driver-side Seq, fed to the single-threaded crawl
  * oracle) and the distributed (spark.range -> mapPartitions) generators,
  * so Spark-vs-oracle golden tests compare identical inputs by
  * construction and the distributed path scales to bench sizes with no
  * driver materialization.
  *
  * Host distribution is Zipf-like via u^3 inverse-CDF skew: top host draws
  * ~27% of URLs, top-3 ~45% — exercises the hot-host salting path
  * (north_rule "host-hashed salted partitioning to break skew on hot news
  * domains").
  */
object Gen {
  val GenSeed = 42L
  val NumHosts = 50

  @inline private def mix(a: Long, b: Long): Long = ImageKit.mix64(a ^ ImageKit.mix64(b))

  def hostName(idx: Int): String = s"news$idx.example.com"

  /** Seed row i: dirty URL + priority. ~70% unique articles; 8 dirt
    * variants that all canonicalize back to the clean form.
    */
  def seedOf(i: Long, n: Long): Seed = {
    val articleSpace = math.max(1L, (n * 7) / 10)
    val articleId = java.lang.Long.remainderUnsigned(mix(GenSeed, i * 2 + 1), articleSpace)
    val u = (java.lang.Long.remainderUnsigned(mix(GenSeed + 7, articleId), 1000000L)) / 1000000.0
    val hostIdx = math.min(NumHosts - 1, (u * u * u * NumHosts).toInt)
    val host = hostName(hostIdx)
    val section = (articleId % 7) match {
      case 0 => "politics"; case 1 => "world"; case 2 => "tech"; case 3 => "sports"
      case 4 => "life"; case 5 => "local"; case _ => "money"
    }
    val cleanPath = s"/news/$section/art-$articleId"
    val variant = (mix(GenSeed + 13, i) & 0x7).toInt
    val url = variant match {
      case 0 => s"http://$host$cleanPath"
      case 1 => s"http://${host.toUpperCase}:80$cleanPath"
      case 2 => s"http://$host$cleanPath#comments"
      case 3 => s"http://$host$cleanPath?utm_source=feed&utm_medium=rss"
      case 4 => s"http://$host$cleanPath?b=2&a=1" // param order canonicalized
      case 5 => s"http://$host/news/ignore/../$section/./art-$articleId"
      case 6 => s"https://$host:443$cleanPath" // distinct scheme => distinct URL
      case _ => s"http://$host$cleanPath?a=1&b=2" // dup of variant-4 canon form
    }
    val priority = (mix(GenSeed + 29, i) & 0xffffL) / 65536.0
    Seed(url, priority)
  }

  /** Local mirror — feeds the single-threaded oracle (SURVEY.md §2.10). */
  def seedsLocal(n: Int): IndexedSeq[Seed] = (0L until n.toLong).map(seedOf(_, n))

  /** Scale-adaptive source partitioning: derive the split count from the
    * row count instead of pinning defaultParallelism, so a 200-row demo
    * epoch runs 1 task while bench/cluster sizes (>=512k rows) still fan
    * out to every core. Row i is a pure function of (i, n) regardless of
    * partitioning, so the generated DATA is identical at any split count
    * (golden-pinned by every spec that consumes these sources).
    */
  private def adaptiveParts(spark: SparkSession, n: Long, rowsPerPart: Long): Int = {
    val bySize = (n + rowsPerPart - 1) / rowsPerPart
    math.max(1L, math.min(bySize, spark.sparkContext.defaultParallelism.toLong)).toInt
  }

  /** Distributed generator: same formula, scales with partitions. */
  def seeds(spark: SparkSession, n: Long, partitions: Int = 0): Dataset[Seed] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions else adaptiveParts(spark, n, 16384L)
    spark.range(0L, n, 1L, parts).mapPartitions(_.map(i => seedOf(i, n)))
  }

  /** Deterministic per-host robots rules + politeness budgets.
    * Host 0..NumHosts-1; a minority of hosts disallow one section prefix.
    */
  def robotsLocal(): IndexedSeq[RobotsEntry] =
    (0 until NumHosts).map { idx =>
      val h = mix(GenSeed + 31, idx)
      val disallowed = (h & 0x3) match {
        case 0 => Seq(RobotsRule(allow = false, prefix = "/news/politics"))
        case 1 => Seq(RobotsRule(allow = false, prefix = "/news/local"),
                      RobotsRule(allow = true, prefix = "/news/local/open"))
        case _ => Seq.empty
      }
      RobotsEntry(
        host = hostName(idx),
        rules = disallowed :+ RobotsRule(allow = true, prefix = "/"),
        fetched_epoch = 0,
        crawl_delay_ms = 100L * (1L + java.lang.Long.remainderUnsigned(h >>> 8, 5L)),
        host_budget = 40 + (java.lang.Long.remainderUnsigned(h >>> 16, 60L)).toInt)
    }

  def robots(spark: SparkSession): Dataset[RobotsEntry] = {
    import spark.implicits._
    spark.createDataset(robotsLocal())
  }

  /** One primary-table row (BASELINE.json input_hint schema): pixels are a
    * pure function of (image_id, variant); caption of (image_id, captionVer).
    * `variant` bumps simulate pixel revisions across epochs.
    */
  def snapshotRow(imageId: String, variant: Int, captionVer: Int, fmt: String,
                  epoch: Int, w: Int = 48, h: Int = 32): Snapshot = {
    val seed = ImageKit.mix64(imageId.hashCode.toLong ^ GenSeed)
    val px = ImageKit.genPixels(seed, variant, w, h)
    val bytes = ImageKit.encode(px, w, h, fmt)
    Snapshot(
      image_id = imageId, bytes = bytes, w = w, h = h, fmt = fmt,
      caption = s"caption of $imageId v$captionVer",
      phash = ImageKit.phash64(bytes), epoch = epoch)
  }

  /** Multimodal asset row i: even i — a GFV1 video (16 frames, 32x24,
    * 8 fps); odd i — a GFA1 audio clip (8 kHz, 2 s). Payload is a pure
    * function of i (MediaKit containers), so every frame/window feature is
    * independently recomputable in tests.
    */
  def mediaOf(i: Long): MediaRow = {
    val seed = mix(GenSeed + 41, i)
    if (i % 2 == 0) {
      val nFrames = 16
      MediaRow(s"media-$i", "video", MediaKit.encodeVideo(seed, nFrames, 32, 24),
        duration_ms = nFrames * 1000L / 8, fps = 8, sample_rate = 0,
        n_frames = nFrames)
    } else {
      val rate = 8000; val nSamples = rate * 2
      MediaRow(s"media-$i", "audio", MediaKit.encodeAudio(seed, rate, nSamples),
        duration_ms = 2000L, fps = 0, sample_rate = rate, n_frames = nSamples)
    }
  }

  def mediaLocal(n: Int): IndexedSeq[MediaRow] = (0L until n.toLong).map(mediaOf)

  /** c43 scene fixture: a 24-frame GFV1 video of static SHOTS — frames
    * within a scene are pixel-identical (phash delta 0), each boundary
    * jumps to a fresh seed (delta ~half the hash bits). The boundary set
    * is a pure function of i, so tests recompute the expected cuts.
    */
  def sceneBoundariesOf(i: Long): Seq[Int] =
    Seq(0, 6 + (i % 4).toInt, 13, 19 + (i % 2).toInt)

  def sceneMediaOf(i: Long): MediaRow = {
    val seed = mix(GenSeed + 43, i)
    val bounds = sceneBoundariesOf(i)
    val nFrames = 24
    val frames = Array.tabulate(nFrames) { f =>
      val scene = bounds.lastIndexWhere(_ <= f)
      graft.functions.ImageKit.genPixels(mix(seed, scene.toLong), 0, 32, 24)
    }
    MediaRow(s"scene-$i", "video",
      MediaKit.encodeVideoFromPixels(frames, 32, 24),
      duration_ms = nFrames * 1000L / 8, fps = 8, sample_rate = 0,
      n_frames = nFrames)
  }

  // media rows carry a per-row video/audio ENCODE kernel (~ms each), so
  // they saturate cores at a much smaller row count than the seed rows
  def sceneMedia(spark: SparkSession, n: Long, partitions: Int = 0): Dataset[MediaRow] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions else adaptiveParts(spark, n, 8L)
    spark.range(0L, n, 1L, parts).mapPartitions(_.map(i => sceneMediaOf(i)))
  }

  def media(spark: SparkSession, n: Long, partitions: Int = 0): Dataset[MediaRow] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions else adaptiveParts(spark, n, 8L)
    spark.range(0L, n, 1L, parts).mapPartitions(_.map(i => mediaOf(i)))
  }
}
