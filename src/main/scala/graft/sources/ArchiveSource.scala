package graft.sources

import java.io.File
import java.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S9 — DataSource V2 reader for the GRFT archival record format
  * (ArchiveFormat): the one source in the engine a built-in CANNOT
  * express — concatenated variable-length binary records are not
  * parquet/csv/json-shaped, so this is the custom-connector extension
  * point (TableProvider -> ScanBuilder -> Batch -> PartitionReader),
  * exactly the surface a production engine uses for WARC.
  *
  * Scale shape: one InputPartition per archive FILE (the writer bounds
  * file size, WARC-style, so files are the parallel unit and no split
  * ever guesses a record boundary); COLUMN PRUNING is pushed into the
  * byte stream — `SupportsPushDownRequiredColumns` narrows the schema
  * and the reader SKIPS unwanted bodies with seeks, so a metadata scan
  * of a payload archive reads headers only. Usage:
  * `spark.read.format("graft.sources.ArchiveSource").load(dir)`.
  */
class ArchiveSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArchiveSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ArchiveTable(ArchiveSource.pathOf(properties))
  override def supportsExternalMetadata(): Boolean = false
}

object ArchiveSource {
  val Schema: StructType = StructType(Seq(
    StructField("image_id", StringType, nullable = false),
    StructField("epoch", IntegerType, nullable = false),
    StructField("caption", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false)))

  private[sources] def pathOf(properties: util.Map[String, String]): String = {
    val p = Option(properties.get("path")).orElse(Option(properties.get("paths")))
      .getOrElse(throw new IllegalArgumentException("archive source needs a path"))
    // .load(dir) hands a single path through as-is; a JSON list means
    // multi-path load, which this source keeps single-rooted by contract
    require(!p.startsWith("["), "archive source takes exactly one root path")
    p
  }

  private[sources] def listFiles(root: String): Array[String] = {
    val d = new File(root)
    if (!d.isDirectory) Array.empty
    else d.listFiles().filter(f => f.isFile && f.getName.endsWith(".grft"))
      .map(_.getAbsolutePath).sorted
  }

  /** Writer: one bounded .grft file per input partition (repartition
    * upstream to size files; the WARC one-archive-per-task convention).
    * Column order fixed by [[Schema]]. Writes `_SUCCESS` last — the
    * atomic-visibility discipline of Snapshots.writeEpoch.
    */
  def write(df: DataFrame, root: String): Unit = {
    val dir = new File(root)
    dir.mkdirs()
    dir.listFiles().filter(_.getName.endsWith(".grft")).foreach(_.delete())
    new File(dir, "_SUCCESS").delete()
    df.select("image_id", "epoch", "caption", "bytes").rdd
      .foreachPartition { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val f = new File(root, f"part-$pid%05d.grft")
        val out = new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(f), 1 << 16)
        try it.foreach { r =>
          out.write(ArchiveFormat.encode(ArchiveFormat.Record(
            r.getString(0), r.getInt(1), r.getString(2),
            r.getAs[Array[Byte]](3))))
        } finally out.close()
      }
    new File(dir, "_SUCCESS").createNewFile()
  }

  /** c75 demo — archive round-trip: write a 4-epoch snapshot corpus as
    * bounded GRFT files, then answer one metadata question over the
    * PRUNED scan (headers only — payload bodies are seek-skipped) and
    * one payload question over the full scan, per epoch.
    */
  def roundTripDemo(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = graft.SparkEnv.scratchDir("grft-c75")
    val rows = (0 until 48).map { i =>
      val s = Gen.snapshotRow(s"img-$i", i % 3, i % 2,
        if (i % 2 == 0) "png" else "jpeg", i % 4)
      (s.image_id, s.epoch, s.caption, s.bytes)
    }
    write(spark.createDataset(rows).toDF("image_id", "epoch", "caption", "bytes")
      .repartition(4), root)
    val archive = spark.read.format("graft.sources.ArchiveSource").load(root)
    val meta = archive.select("image_id", "epoch", "caption")
      .groupBy("epoch")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("caption")).as("n_captions"))
    val payload = archive.select(col("epoch"), length(col("bytes")).as("len"))
      .groupBy("epoch")
      .agg(sum("len").as("sum_bytes"))
    meta.join(payload, "epoch").orderBy("epoch")
  }
}

private class ArchiveTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"grft-archive($root)"
  override def schema(): StructType = ArchiveSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ArchiveScanBuilder(root)
}

private class ArchiveScanBuilder(root: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = ArchiveSource.Schema
  private var pushedEpochs: Option[Set[Int]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Epoch predicates are evaluable from the record HEADER alone — the
    * reader drops non-matching records before materializing either body
    * (bodies seek-skip), so a one-epoch query over a multi-epoch archive
    * reads ~headers only. Everything else stays a residual for Spark.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def epochsOf(f: Filter): Option[Set[Int]] = f match {
      case org.apache.spark.sql.sources.EqualTo("epoch", v: Int) => Some(Set(v))
      case org.apache.spark.sql.sources.In("epoch", vs)
          if vs.forall(_.isInstanceOf[Int]) =>
        Some(vs.map(_.asInstanceOf[Int]).toSet)
      case _ => None
    }
    val (accepted, residual) = filters.partition(epochsOf(_).isDefined)
    accepted.flatMap(epochsOf).foreach { s =>
      pushedEpochs = Some(pushedEpochs.fold(s)(_ intersect s))
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new ArchiveScan(root, required, pushedEpochs)
}

private class ArchiveScan(root: String, required: StructType,
                          epochs: Option[Set[Int]])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"grft-archive root=$root, ReadSchema: ${required.fieldNames.mkString(",")}" +
      epochs.fold("")(s => s", PushedEpochs: ${s.toSeq.sorted.mkString(",")}")
  override def planInputPartitions(): Array[InputPartition] =
    ArchiveSource.listFiles(root).map(ArchiveInputPartition(_): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new ArchiveReaderFactory(required.fieldNames, epochs)
}

private case class ArchiveInputPartition(file: String) extends InputPartition

private class ArchiveReaderFactory(fields: Array[String],
                                   epochs: Option[Set[Int]])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[ArchiveInputPartition].file
    new ArchivePartitionReader(file, fields, epochs)
  }
}

private class ArchivePartitionReader(file: String, fields: Array[String],
                                     epochs: Option[Set[Int]])
    extends PartitionReader[InternalRow] {
  private val wantCaption = fields.contains("caption")
  private val wantBytes = fields.contains("bytes")
  private val it = new ArchiveFormat.FileReader(new File(file), wantCaption,
    wantBytes, keepEpoch = e => epochs.forall(_.contains(e)))
  private var cur: ArchiveFormat.Record = _

  override def next(): Boolean = {
    if (it.hasNext) { cur = it.next(); true } else false
  }
  override def get(): InternalRow = {
    val values = fields.map {
      case "image_id" => UTF8String.fromString(cur.imageId)
      case "epoch" => cur.epoch
      case "caption" => UTF8String.fromString(cur.caption)
      case "bytes" => cur.bytes
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }
  override def close(): Unit = it.close()
}
