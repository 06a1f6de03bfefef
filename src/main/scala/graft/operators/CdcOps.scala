package graft.operators

import graft.functions.{ChunkKit, ImageKit}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** c37 — content-defined-chunking storage dedup for the page archive.
  *
  * Why the crawl needs it: the snapshot store keeps every fetched version
  * of every page; revisions mostly share content with their predecessor.
  * Whole-file dedup (the seen-store's md5 discipline) only collapses
  * IDENTICAL versions; CDC collapses the shared sub-page content too —
  * the unchanged tail of a page that gained one paragraph re-deduplicates
  * because boundaries are content-defined and re-sync after the edit
  * (ChunkKit; FastCDC ATC'16).
  *
  * Scale shape: chunking is a per-row flatMap — bytes never shuffle; the
  * chunk store is a groupBy(chunk_hash) whose keys are content hashes
  * (uniform, no skew); the per-epoch "new bytes" accounting is the
  * SeenStore discipline applied to chunk hashes (min(first_epoch) — one
  * map-side-combined aggregation, ids + scalars only on the exchange).
  */
object CdcOps {

  @inline private def mix(a: Long, b: Long): Long =
    ImageKit.mix64(a ^ ImageKit.mix64(b))

  /** One text block (~25 tokens) of page i — a pure function of
    * (page, block, content-salt).
    */
  private def blockOf(i: Long, salt: Long): String =
    (0 until 25).map { k =>
      "tok" + java.lang.Long.remainderUnsigned(mix(i * 131 + salt, k.toLong), 500L)
    }.mkString(" ") + "\n"

  /** Deterministic page bytes per epoch. Epoch 0: 20 blocks. Pages with
    * i%4==0 never change (whole-file dedup path). Otherwise epoch 1
    * INSERTS a new block after block 3 (shifting the rest — the case
    * fixed-size blocking can't share), and epoch 2 REPLACES block 15 of
    * the epoch-1 layout in place.
    */
  def pageBytesOf(i: Long, epoch: Int): Array[Byte] = {
    val base = (0 until 20).map(j => blockOf(i, j.toLong)).toVector
    val frozen = i % 4 == 0
    val v =
      if (epoch == 0 || frozen) base
      else {
        val inserted = (base.take(4) :+ blockOf(i, 100L)) ++ base.drop(4)
        if (epoch == 1) inserted
        else inserted.updated(16, blockOf(i, 200L)) // block 15 of base layout
      }
    v.mkString.getBytes("UTF-8")
  }

  def pages(spark: SparkSession, n: Int, epochs: Int): DataFrame = {
    import spark.implicits._
    spark.range(0L, n.toLong, 1L, math.max(1, math.min(8, n / 32)))
      .mapPartitions(_.flatMap { i =>
        (0 until epochs).iterator.map(e => (s"page-$i", e, pageBytesOf(i, e)))
      })
      .toDF("page_id", "epoch", "bytes")
  }

  /** Chunk manifest: one row per (page version, chunk) with the chunk's
    * content hash, length, and bytes. Pure per-row flatMap — the binary
    * column is read once and never shuffled by this operator.
    */
  def chunkManifest(pageFrame: DataFrame): DataFrame = {
    import pageFrame.sparkSession.implicits._
    pageFrame.select("page_id", "epoch", "bytes")
      .as[(String, Int, Array[Byte])]
      .flatMap { case (id, epoch, bytes) =>
        ChunkKit.boundaries(bytes).zipWithIndex.map { case ((off, len), idx) =>
          (id, epoch, idx, ChunkKit.md5hex(bytes, off, len), len.toLong,
            java.util.Arrays.copyOfRange(bytes, off, off + len))
        }
      }
      .toDF("page_id", "epoch", "chunk_idx", "chunk_hash", "chunk_len", "chunk_bytes")
  }

  /** c37 — per-epoch storage accounting: raw bytes fetched vs bytes a
    * chunk store actually has to ADD that epoch (chunks first seen then).
    * dedup_ratio = new/raw: epoch 0 pays ~full price; later epochs pay
    * only the edits.
    */
  def dedupReport(spark: SparkSession, n: Int = 300, epochs: Int = 3): DataFrame = {
    // the slim (ids + scalars) manifest feeds two aggregations in one
    // plan — cache it so the chunking flatMap runs once
    val manifest = chunkManifest(pages(spark, n, epochs))
      .select("page_id", "epoch", "chunk_hash", "chunk_len")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perEpoch = manifest.groupBy("epoch").agg(
      countDistinct(col("page_id")).as("n_pages"),
      count(lit(1)).as("n_chunks"),
      sum(col("chunk_len")).as("raw_bytes"))
    // a hash's bytes are stored once, in its first epoch
    val firstSeen = manifest.groupBy("chunk_hash").agg(
      min(col("epoch")).as("epoch"), first(col("chunk_len")).as("len"))
    val newPerEpoch = firstSeen.groupBy("epoch").agg(
      count(lit(1)).as("new_chunks"), sum(col("len")).as("new_bytes"))
    perEpoch.join(newPerEpoch, Seq("epoch"), "left")
      .select(col("epoch"), col("n_pages"), col("n_chunks"), col("raw_bytes"),
        coalesce(col("new_chunks"), lit(0L)).as("new_chunks"),
        coalesce(col("new_bytes"), lit(0L)).as("new_bytes"),
        round(coalesce(col("new_bytes"), lit(0L)).cast("double") /
          col("raw_bytes"), 4).as("dedup_ratio"))
      .orderBy("epoch")
  }
}
