package graft.operators

import graft.SparkTestBase.spark
import graft.functions.ImageKit
import org.scalatest.funsuite.AnyFunSuite

/** c71 goldens (low-contrast audit). Pinned: the kernel is total on
  * garbage and exact on hand-built payloads (solid => (0,0); two-value
  * checker => exact integer stddev); the distributed audit equals a
  * single-threaded mirror bit-for-bit; and the plant accounting holds —
  * solid and near-flat plants flagged, every full-range texture admitted.
  */
class ContrastSpec extends AnyFunSuite {

  test("kernel: totality and hand-built payloads") {
    assert(ImageKit.contrastQ100(null) == ((0, 0L)))
    assert(ImageKit.contrastQ100(Array.emptyByteArray) == ((0, 0L)))
    assert(ImageKit.contrastQ100("junk".getBytes) == ((0, 0L)))
    val w = 40; val h = 20
    val solid = ImageKit.encode(Array.fill(w * h)(77), w, h, "png")
    assert(ImageKit.contrastQ100(solid) == ((0, 0L)))
    // half 0s half 200s: variance = 10000 exactly, stddev x100 = 10000
    val checker = ImageKit.encode(
      Array.tabulate(w * h)(i => if (i % 2 == 0) 0 else 200), w, h, "png")
    assert(ImageKit.contrastQ100(checker) == ((200, 10000L)))
  }

  test("c71 audit == single-threaded mirror; plants flagged, textures admitted") {
    val corpus = ImageOps.contrastCorpus(spark)
    val rows = corpus.collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
    val mirror = rows.map { case (id, bytes) =>
      val (rng, sd) = ImageKit.contrastQ100(bytes)
      (id, rng, sd, rng < 24 || sd < 600L)
    }.sortBy(_._1).toSeq
    val got = ImageOps.contrastDemo(spark).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(got == mirror)
    got.foreach { case (id, _, _, low) =>
      val i = id.stripPrefix("img-").toInt
      if (i % 5 == 0 || i % 7 == 0) assert(low, s"plant must be flagged: $id")
      else assert(!low, s"texture must be admitted: $id")
    }
  }
}
