package graft.operators

import graft.SparkTestBase.spark
import graft.functions.ChunkKit
import org.scalatest.funsuite.AnyFunSuite

/** c37 goldens: chunk spans must tile every page exactly within the
  * min/max bounds, the manifest must reconstruct the original bytes, the
  * distributed report must equal a single-threaded mirror, and the
  * content-defined property must hold — an insertion edit re-shares the
  * unchanged tail.
  */
class CdcSpec extends AnyFunSuite {
  private val n = 120
  private val epochs = 3

  test("chunk spans tile each page exactly, within length bounds") {
    for (i <- Seq(0L, 1L, 7L, 63L); e <- 0 until epochs) {
      val bytes = CdcOps.pageBytesOf(i, e)
      val spans = ChunkKit.boundaries(bytes)
      assert(spans.head._1 == 0)
      spans.sliding(2).foreach {
        case Seq((o1, l1), (o2, _)) => assert(o1 + l1 == o2, s"gap at $o2")
        case _ =>
      }
      val (lo, ll) = spans.last
      assert(lo + ll == bytes.length, "spans don't cover the page")
      spans.dropRight(1).foreach { case (_, l) =>
        assert(l >= 64 && l <= 1024, s"chunk length $l out of bounds")
      }
      assert(spans.last._2 <= 1024)
    }
  }

  test("manifest reconstructs the original bytes (distributed)") {
    val got = CdcOps.chunkManifest(CdcOps.pages(spark, 16, epochs))
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)), (r.getInt(2), r.getAs[Array[Byte]](5))))
      .groupBy(_._1)
    got.foreach { case ((id, e), rows) =>
      val i = id.stripPrefix("page-").toLong
      val rebuilt = rows.map(_._2).sortBy(_._1).flatMap(_._2)
      assert(java.util.Arrays.equals(rebuilt, CdcOps.pageBytesOf(i, e)),
        s"reconstruction mismatch for $id epoch $e")
    }
  }

  test("c37 report == single-threaded mirror exactly") {
    case class Agg(var pages: Set[String] = Set.empty, var chunks: Long = 0,
                   var raw: Long = 0, var newChunks: Long = 0, var newBytes: Long = 0)
    val byEpoch = scala.collection.mutable.Map.empty[Int, Agg]
    val firstSeen = scala.collection.mutable.Map.empty[String, (Int, Long)]
    for (e <- 0 until epochs; i <- 0L until n.toLong) {
      val bytes = CdcOps.pageBytesOf(i, e)
      val agg = byEpoch.getOrElseUpdate(e, Agg())
      agg.pages += s"page-$i"
      ChunkKit.boundaries(bytes).foreach { case (off, len) =>
        val h = ChunkKit.md5hex(bytes, off, len)
        agg.chunks += 1; agg.raw += len
        if (!firstSeen.contains(h)) firstSeen(h) = (e, len.toLong)
      }
    }
    firstSeen.values.foreach { case (e, len) =>
      val agg = byEpoch(e); agg.newChunks += 1; agg.newBytes += len
    }
    def round4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = byEpoch.toSeq.sortBy(_._1).map { case (e, a) =>
      (e, a.pages.size.toLong, a.chunks, a.raw, a.newChunks, a.newBytes,
        round4(a.newBytes.toDouble / a.raw))
    }
    val got = CdcOps.dedupReport(spark, n, epochs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got == want)
  }

  test("content-defined re-sync: an insertion edit re-shares the tail") {
    // page 1 changes at epoch 1 (insert after block 3). CDC must still
    // share most epoch-0 chunk bytes; fixed-size blocking would share ~0
    // past the edit point.
    val v0 = CdcOps.pageBytesOf(1L, 0)
    val v1 = CdcOps.pageBytesOf(1L, 1)
    def hashes(b: Array[Byte]): Map[String, Long] =
      ChunkKit.boundaries(b).map { case (o, l) =>
        ChunkKit.md5hex(b, o, l) -> l.toLong
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val h0 = hashes(v0); val h1 = hashes(v1)
    val shared = h0.keySet.intersect(h1.keySet).toSeq
      .map(k => math.min(h0(k), h1(k))).sum
    val frac = shared.toDouble / v0.length
    assert(frac >= 0.5, s"CDC shared only ${(frac * 100).round}% across an insertion")
    // and the fixed-size contrast: 256-byte blocks share (almost) nothing
    def fixedHashes(b: Array[Byte]): Set[String] =
      b.grouped(256).zipWithIndex
        .map { case (g, _) => ChunkKit.md5hex(g, 0, g.length) }.toSet
    val fshared = fixedHashes(v0).intersect(fixedHashes(v1)).size
    assert(fshared <= 2, s"fixed blocking unexpectedly shared $fshared blocks")
  }

  test("frozen pages add zero new bytes after epoch 0") {
    val manifest = CdcOps.chunkManifest(CdcOps.pages(spark, 32, epochs))
      .select("page_id", "epoch", "chunk_hash").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val frozen = manifest.filter(r => r._1.stripPrefix("page-").toLong % 4 == 0)
    val e0 = frozen.filter(_._2 == 0).map(_._3).toSet
    frozen.filter(_._2 > 0).foreach { case (id, e, h) =>
      assert(e0.contains(h), s"frozen $id epoch $e produced a new chunk")
    }
  }
}
