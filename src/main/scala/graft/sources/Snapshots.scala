package graft.sources

import graft.model.{PartitionLineage, Snapshot}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Epoch-snapshot store + manifest-based checkpointing (SURVEY.md §2.1
  * S2/S3/S6, §3 E3; north_rule "resumable from Iceberg snapshot checkpoints
  * with per-partition lineage and fetch/parse metrics").
  *
  * No iceberg-spark-runtime jar exists in this zero-egress sandbox
  * (SURVEY.md §7.0), so the Iceberg commit protocol is emulated with the
  * same observable semantics: epoch-partitioned parquet + an ATOMIC manifest
  * rename as the commit point. An epoch is committed iff
  * `root/_manifests/epoch-N.json` exists; a crash mid-write leaves data
  * files but no manifest, and resume re-runs the epoch idempotently
  * (deterministic inputs => identical outputs, overwrite mode). Swapping
  * this object for Iceberg `spark.table` calls is a sink-level change only.
  */
object Snapshots {

  def read(spark: SparkSession, root: String, epoch: Int): DataFrame =
    spark.read.parquet(s"$root/snapshots")
      .where(col("epoch") === epoch) // partition-pruned directory scan

  def readUpTo(spark: SparkSession, root: String, maxEpoch: Int): DataFrame =
    spark.read.parquet(s"$root/snapshots").where(col("epoch") <= maxEpoch)

  /** Write one epoch's snapshot data + per-partition lineage WITHOUT
    * committing. The caller finishes all of the epoch's sibling state
    * (url_seen, bloom sidecars, latest-version table) and only then calls
    * [[commitManifest]] — the manifest is the single atomic commit point, so
    * a crash anywhere before it leaves an uncommitted epoch that resume
    * re-runs idempotently (every write here is per-epoch overwrite).
    */
  def writeEpoch(snaps: Dataset[Snapshot], root: String, epoch: Int): PartitionLineageSummary = {
    import snaps.sparkSession.implicits._
    // the epoch=N directory IS the partition value — keeping the data
    // column too would collide with partition inference on root scans
    snaps.drop("epoch").write.mode("overwrite")
      .parquet(s"$root/snapshots/epoch=$epoch")
    // per-partition lineage: counts + phash/url_hash ranges per task
    // partition (north_rule metrics clause) — computed on the written data
    // so the manifest describes what is actually at rest. Written to an
    // epoch=N subdir with overwrite => idempotent under epoch re-runs.
    val written = snaps.sparkSession.read.parquet(s"$root/snapshots/epoch=$epoch")
    val lineage = written
      .groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("phash")).as("min_phash"),
        max(col("phash")).as("max_phash"),
        min(xxhash64(col("image_id"))).as("min_url_hash"),
        max(xxhash64(col("image_id"))).as("max_url_hash"))
      .select(lit(epoch).as("epoch"), col("partition_id").cast("int"),
        col("n_rows"), col("min_phash"), col("max_phash"),
        col("min_url_hash"), col("max_url_hash"))
      .as[PartitionLineage]
      .collect()
    lineage.toSeq.toDS().drop("epoch") // epoch=N dir IS the partition value
      .write.mode("overwrite").parquet(s"$root/lineage/epoch=$epoch")
    val total = lineage.map(_.n_rows).sum
    PartitionLineageSummary(epoch, total, lineage.length)
  }

  /** Legacy single-call form: write + immediately commit (no sibling state). */
  def commit(snaps: Dataset[Snapshot], root: String, epoch: Int): PartitionLineageSummary = {
    val s = writeEpoch(snaps, root, epoch)
    commitManifest(root, epoch, s.n_rows, s.n_partitions)
    s
  }

  final case class PartitionLineageSummary(epoch: Int, n_rows: Long, n_partitions: Int)

  def commitManifest(root: String, epoch: Int, nRows: Long, nParts: Int): Unit = {
    val dir = Paths.get(s"$root/_manifests")
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".epoch-$epoch.json.tmp")
    val fin = dir.resolve(s"epoch-$epoch.json")
    Files.writeString(tmp, s"""{"epoch":$epoch,"n_rows":$nRows,"n_partitions":$nParts}""")
    Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Columns carried by the latest-version sidecar — everything the
    * revision diff needs and nothing else (bytes NEVER enter this table).
    */
  private val LatestCols = Seq("image_id", "epoch", "phash", "caption")

  /** Latest version per image_id as of `epoch` (`root/latest/epoch=N`).
    * Maintained so each epoch's revision diff touches current + latest-prior
    * only — O(|current| + |corpus|) flat in epoch count — instead of
    * re-windowing the entire snapshot history (which grows O(total
    * snapshots) per epoch: a scale-killer once epochs accumulate).
    */
  def readLatest(spark: SparkSession, root: String, epoch: Int): DataFrame = {
    val path = s"$root/latest/epoch=$epoch"
    if (epoch < 0 || !new java.io.File(path).exists())
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "image_id STRING, epoch INT, phash BIGINT, caption STRING"))
    else spark.read.parquet(path)
      .withColumn("epoch", col("snap_epoch")).drop("snap_epoch")
      .select(LatestCols.map(col): _*)
  }

  /** latest(e) = current(e) ∪ (latest(e-1) ∖ ids present in current(e)).
    * Per-epoch overwrite of `latest/epoch=e` — idempotent under re-runs;
    * prior-epoch dirs are retained so resume reads a consistent version.
    */
  def writeLatest(spark: SparkSession, root: String, epoch: Int): Unit = {
    val cur = read(spark, root, epoch).select(LatestCols.map(col): _*)
    val prev = readLatest(spark, root, epoch - 1)
    val merged = prev
      .join(cur.select("image_id"), Seq("image_id"), "left_anti")
      .unionByName(cur)
    // store the row's own epoch under a non-partition name: the epoch=N
    // directory means "as of N", not the version's epoch
    merged.withColumnRenamed("epoch", "snap_epoch")
      .write.mode("overwrite").parquet(s"$root/latest/epoch=$epoch")
  }

  /** Highest committed epoch, or -1 (E3 resume entry point). */
  def latestCommittedEpoch(root: String): Int = {
    val dir = Paths.get(s"$root/_manifests")
    if (!Files.isDirectory(dir)) return -1
    val re = "epoch-(\\d+)\\.json".r
    val it = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      it.iterator().asScala
        .flatMap(p => re.findFirstMatchIn(p.getFileName.toString).map(_.group(1).toInt))
        .foldLeft(-1)(math.max)
    } finally it.close()
  }
}
