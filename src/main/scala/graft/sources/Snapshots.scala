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

  /** Write one epoch partition + lineage, then atomically commit. */
  def commit(snaps: Dataset[Snapshot], root: String, epoch: Int): PartitionLineageSummary = {
    import snaps.sparkSession.implicits._
    // the epoch=N directory IS the partition value — keeping the data
    // column too would collide with partition inference on root scans
    snaps.drop("epoch").write.mode("overwrite")
      .parquet(s"$root/snapshots/epoch=$epoch")
    // per-partition lineage: counts + url-hash range per task partition
    // (north_rule metrics clause) — computed on the written data so the
    // manifest describes what is actually at rest.
    val written = snaps.sparkSession.read.parquet(s"$root/snapshots/epoch=$epoch")
    val lineage = written
      .groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("phash")).as("min_url_hash"),
        max(col("phash")).as("max_url_hash"))
      .select(lit(epoch).as("epoch"), col("partition_id").cast("int"),
        col("n_rows"), col("min_url_hash"), col("max_url_hash"))
      .as[PartitionLineage]
      .collect()
    lineage.toSeq.toDS().write.mode("append").parquet(s"$root/lineage")
    val total = lineage.map(_.n_rows).sum
    commitManifest(root, epoch, total, lineage.length)
    PartitionLineageSummary(epoch, total, lineage.length)
  }

  final case class PartitionLineageSummary(epoch: Int, n_rows: Long, n_partitions: Int)

  private def commitManifest(root: String, epoch: Int, nRows: Long, nParts: Int): Unit = {
    val dir = Paths.get(s"$root/_manifests")
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".epoch-$epoch.json.tmp")
    val fin = dir.resolve(s"epoch-$epoch.json")
    Files.writeString(tmp, s"""{"epoch":$epoch,"n_rows":$nRows,"n_partitions":$nParts}""")
    Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
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
