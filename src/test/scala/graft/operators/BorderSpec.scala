package graft.operators

import graft.SparkTestBase.spark
import graft.functions.ImageKit
import org.scalatest.funsuite.AnyFunSuite

/** c69 goldens (uniform-border / letterbox audit). Pinned: the kernel is
  * total on garbage and exact on hand-built bars (including the
  * stacked-different-bars case the outer-mean check exists for); the
  * distributed audit equals a single-threaded mirror column-for-column;
  * and the plant accounting holds — letterboxed rows read their bar on
  * both vertical edges and verdict PADDED, pillarboxed on both horizontal
  * edges, the 1-px artifact row stays clean, clean rows stay clean.
  */
class BorderSpec extends AnyFunSuite {

  test("kernel: totality and hand-built bars") {
    assert(ImageKit.borderWidths(null) == ((0, 0, 0, 0)))
    assert(ImageKit.borderWidths(Array.emptyByteArray) == ((0, 0, 0, 0)))
    assert(ImageKit.borderWidths("junk".getBytes) == ((0, 0, 0, 0)))
    val w = 40; val h = 20
    val px = ImageKit.genPixels(ImageKit.mix64(99L), 0, w, h)
    val bar3 = Array.fill(3 * w)(10) ++ px ++ Array.fill(3 * w)(10)
    val png = ImageKit.encode(bar3, w, h + 6, "png")
    val (t, b, l, r) = ImageKit.borderWidths(png)
    assert(t == 3 && b == 3, s"got t=$t b=$b")
    // stacked different-colored flat bars must count only the OUTER bar:
    // a black bar then a white bar is a frame plus content edge, not one
    // 6-deep border
    val stacked = Array.fill(3 * w)(10) ++ Array.fill(3 * w)(200) ++ px
    val png2 = ImageKit.encode(stacked, w, h + 6, "png")
    assert(ImageKit.borderWidths(png2)._1 == 3)
    // fully-flat image: capped at half each dimension, no crossing
    val flat = ImageKit.encode(Array.fill(w * h)(42), w, h, "png")
    assert(ImageKit.borderWidths(flat) == ((h / 2, h / 2, w / 2, w / 2)))
  }

  test("c69 audit == single-threaded mirror; plant accounting exact") {
    val corpus = ImageOps.borderCorpus(spark)
    val rows = corpus.collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
    val mirror = rows.map { case (id, bytes) =>
      val (t, b, l, r) = ImageKit.borderWidths(bytes, 8)
      val packed = ImageKit.headerDims64(bytes)
      val w = math.max(ImageKit.dimsW(packed), 1)
      val h = math.max(ImageKit.dimsH(packed), 1)
      val vf = math.round((t + b) * 10000.0 / h) / 10000.0
      val hf = math.round((l + r) * 10000.0 / w) / 10000.0
      (id, t, b, l, r, vf, hf, vf >= 0.1 || hf >= 0.1)
    }.sortBy(_._1)
    val got = ImageOps.borderDemo(spark).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getDouble(5), r.getDouble(6), r.getBoolean(7)))
      .toSeq
    assert(got == mirror.toSeq)
    val byId = got.map(g => g._1 -> g).toMap
    for (i <- 0 until 66) {
      val g = byId(s"img-$i")
      if (i % 4 == 0) {
        val bar = Seq(3, 5, 7)(i / 4 % 3)
        assert(g._2 >= bar && g._3 >= bar && g._8, s"letterbox i=$i: $g")
      } else if (i % 6 == 0) {
        val bar = Seq(4, 6)(i / 6 % 2)
        assert(g._4 >= bar && g._5 >= bar && g._8, s"pillarbox i=$i: $g")
      } else if (i % 11 == 0) {
        assert(g._2 >= 1 && !g._8, s"artifact row must stay clean i=$i: $g")
      } else {
        assert(!g._8, s"clean i=$i: $g")
      }
    }
  }
}
