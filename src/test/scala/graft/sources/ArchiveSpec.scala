package graft.sources

import java.io.{File, RandomAccessFile}

import graft.SparkTestBase.{spark, tempDir}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

/** S9 goldens (GRFT archival record format + DSv2 source). Pinned:
  * write -> read round-trips every row exactly; column pruning reaches
  * the SCAN (BatchScanExec output is the pruned set, and the byte-level
  * reader skips unwanted bodies); the parallel unit is the file; a
  * truncated tail ends that file cleanly with every complete record
  * kept (WARC reader convention) while a malformed record START throws.
  */
class ArchiveSpec extends AnyFunSuite {
  import spark.implicits._

  private def corpus(n: Int) = {
    val rows = (0 until n).map { i =>
      val s = Gen.snapshotRow(s"img-$i", i % 3, 0, if (i % 2 == 0) "png" else "jpeg", i % 4)
      (s.image_id, s.epoch, s.caption + (if (i % 5 == 0) "\nmultiline" else ""),
        s.bytes)
    }
    spark.createDataset(rows).toDF("image_id", "epoch", "caption", "bytes")
  }

  private def readArchive(root: String) =
    spark.read.format("graft.sources.ArchiveSource").load(root)

  private def keyed(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
      r.getAs[Array[Byte]](3).toSeq)).toSet

  test("round-trip: read(write(df)) == df exactly, including payload bytes") {
    val root = tempDir("grft-archive")
    val df = corpus(37).repartition(3)
    ArchiveSource.write(df, root)
    assert(new File(root, "_SUCCESS").exists())
    val back = readArchive(root)
    assert(keyed(back.select("image_id", "epoch", "caption", "bytes")) == keyed(corpus(37)))
  }

  test("file is the parallel unit: one partition per bounded archive file") {
    val root = tempDir("grft-parts")
    ArchiveSource.write(corpus(24).repartition(3), root)
    assert(new File(root).listFiles().count(_.getName.endsWith(".grft")) == 3)
    assert(readArchive(root).rdd.getNumPartitions == 3)
  }

  test("column pruning reaches the scan and the byte stream") {
    val root = tempDir("grft-prune")
    ArchiveSource.write(corpus(20).repartition(1), root)
    val pruned = readArchive(root).select("image_id", "epoch")
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.output.map(_.name)
    }
    assert(scans == Seq(Seq("image_id", "epoch")),
      s"pruning did not reach the scan: $scans")
    assert(pruned.collect().map(r => (r.getString(0), r.getInt(1))).toSet ==
      corpus(20).select("image_id", "epoch").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSet)
    // byte-level skip path: the pruned FileReader never materializes bodies
    val f = new File(root).listFiles().filter(_.getName.endsWith(".grft")).head
    val rd = new ArchiveFormat.FileReader(f, wantCaption = false, wantBytes = false)
    try {
      val recs = rd.toSeq
      assert(recs.size == 20 && recs.forall(r => r.caption.isEmpty && r.bytes.isEmpty))
    } finally rd.close()
  }

  test("epoch filter pushes into the scan and the byte stream") {
    val root = tempDir("grft-filter")
    ArchiveSource.write(corpus(40).repartition(2), root)
    val q = readArchive(root).where($"epoch" === 2).select("image_id", "epoch")
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scans.exists(_.contains("PushedEpochs: 2")),
      s"epoch filter did not reach the scan: $scans")
    assert(q.collect().map(_.getString(0)).toSet ==
      corpus(40).where($"epoch" === 2).collect().map(_.getString(0)).toSet)
    // IN-list form intersects with equality at the builder
    val q2 = readArchive(root).where($"epoch".isin(1, 2, 3)).select("epoch").distinct()
    assert(q2.collect().map(_.getInt(0)).toSet == Set(1, 2, 3))
    // byte-level: a rejecting predicate materializes nothing
    val f = new File(root).listFiles().filter(_.getName.endsWith(".grft")).head
    val rd = new ArchiveFormat.FileReader(f, wantCaption = true, wantBytes = true,
      keepEpoch = _ => false)
    try assert(!rd.hasNext) finally rd.close()
  }

  test("truncated tail drops only the cut record; earlier records survive") {
    val root = tempDir("grft-trunc")
    ArchiveSource.write(corpus(10).repartition(1), root)
    val f = new File(root).listFiles().filter(_.getName.endsWith(".grft")).head
    val raf = new RandomAccessFile(f, "rw")
    raf.setLength(raf.length() - 7) // cut into the final record's payload
    raf.close()
    val got = readArchive(root).select("image_id").collect().map(_.getString(0)).toSet
    assert(got.size == 9, s"expected 9 surviving records, got ${got.size}")
  }

  test("malformed record start throws (corruption is not truncation)") {
    val root = tempDir("grft-bad")
    val f = new File(root, "part-00000.grft")
    root.toString // ensure dir
    new File(root).mkdirs()
    java.nio.file.Files.write(f.toPath, "BOGUS/9.9\nid: x\n\n".getBytes)
    intercept[IllegalArgumentException] {
      val rd = new ArchiveFormat.FileReader(f, wantCaption = true, wantBytes = true)
      try while (rd.hasNext) rd.next()
      finally rd.close()
    }
  }
}
