package graft.operators

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import graft.SparkTestBase.spark
import graft.functions.ImageKit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** c63 header-dims audit: the header-only sniff (PNG IHDR fixed offsets,
  * JPEG SOFn marker walk) == a FULL ImageIO decode's dimensions — an
  * independent oracle, not the kernel mirroring itself — across formats
  * and sizes; the pure-column PNG formulation agrees with the codegen
  * expression; the audit catches every planted mismatch/truncation.
  */
class HeaderDimsSpec extends AnyFunSuite {

  test("headerDims64 == full ImageIO decode dims for both formats across sizes") {
    val sizes = Seq((48, 32), (47, 31), (1, 1), (2, 3), (129, 65), (320, 200))
    for ((w, h) <- sizes; fmt <- Seq("png", "jpeg", "gif", "bmp")) {
      val px = ImageKit.genPixels(ImageKit.mix64(w * 1009L + h), 0, w, h)
      val bytes = ImageKit.encode(px, w, h, fmt)
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      val packed = ImageKit.headerDims64(bytes)
      assert(ImageKit.dimsW(packed) == img.getWidth, s"$fmt ${w}x$h width")
      assert(ImageKit.dimsH(packed) == img.getHeight, s"$fmt ${w}x$h height")
    }
  }

  test("degenerate payloads are total: -1, never a throw") {
    assert(ImageKit.headerDims64(null) == -1L)
    assert(ImageKit.headerDims64(Array.emptyByteArray) == -1L)
    assert(ImageKit.headerDims64("not an image at all".getBytes) == -1L)
    val png = ImageKit.encode(ImageKit.genPixels(1L, 0, 8, 8), 8, 8, "png")
    val jpg = ImageKit.encode(ImageKit.genPixels(2L, 0, 8, 8), 8, 8, "jpeg")
    val gif = ImageKit.encode(ImageKit.genPixels(3L, 0, 8, 8), 8, 8, "gif")
    val bmp = ImageKit.encode(ImageKit.genPixels(4L, 0, 8, 8), 8, 8, "bmp")
    // every truncation point up to the full header region parses or -1s
    for (k <- 0 until 32; b <- Seq(png, jpg, gif, bmp)) {
      ImageKit.headerDims64(b.take(k))
    }
    // cuts before each container's dimension field specifically must refuse
    assert(ImageKit.headerDims64(png.take(12)) == -1L)
    assert(ImageKit.headerDims64(jpg.take(12)) == -1L)
    assert(ImageKit.headerDims64(gif.take(5)) == -1L)
    assert(ImageKit.headerDims64(bmp.take(13)) == -1L)
  }

  test("pure-column PNG IHDR parse == HeaderDims64 expression") {
    import spark.implicits._
    val rows = (0 until 20).map { i =>
      val w = 8 + i; val h = 40 - i
      (s"p-$i", ImageKit.encode(
        ImageKit.genPixels(ImageKit.mix64(i + 77L), 0, w, h), w, h, "png"))
    }
    val df = rows.toDF("image_id", "bytes")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // IHDR width/height: big-endian u32 at bytes 17/21 (1-based substring)
    val got = df.select(col("image_id"),
        conv(hex(substring(col("bytes"), 17, 4)), 16, 10).cast("long").as("cw"),
        conv(hex(substring(col("bytes"), 21, 4)), 16, 10).cast("long").as("ch"),
        graft.functions.GraftFunctions.headerDims64(col("bytes")).as("packed"))
      .collect()
    got.foreach { r =>
      val packed = r.getLong(3)
      assert(r.getLong(1) == ImageKit.dimsW(packed).toLong, r.getString(0))
      assert(r.getLong(2) == ImageKit.dimsH(packed).toLong, r.getString(0))
    }
  }

  test("dims audit == local mirror; every plant rejected, every clean row admitted") {
    val n = 70
    val audit = ImageOps.dimsAuditDemo(spark).collect()
      .map(r => r.getString(0) ->
        ((r.getInt(4), r.getInt(5), r.getBoolean(6)))).toMap
    assert(audit.size == n)
    // mirror replants the corpus locally and runs the kernel per row
    val local = ImageOps.dimsCorpus(spark, n).collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1), r.getInt(3), r.getInt(4)))
    local.foreach { case (id, bytes, dw, dh) =>
      val packed = ImageKit.headerDims64(bytes)
      val (sw, sh) = (ImageKit.dimsW(packed), ImageKit.dimsH(packed))
      val (gw, gh, gok) = audit(id)
      assert((gw, gh) == ((sw, sh)), s"sniffed dims of $id")
      assert(gok == (sw == dw && sh == dh), s"verdict of $id")
    }
    // plant accounting: every 5th mis-sized, every 7th-not-5th truncated
    val ids = (0 until n).map(i => s"img-$i")
    ids.foreach { id =>
      val i = id.stripPrefix("img-").toInt
      val (gw, gh, gok) = audit(id)
      if (i % 5 == 0) {
        assert(!gok && gw == 24 && gh == 16, s"half-size plant $id")
      } else if (i % 7 == 0) {
        assert(!gok && gw == -1 && gh == -1, s"truncation plant $id")
      } else {
        assert(gok && gw == 48 && gh == 32, s"clean row $id")
      }
    }
  }
}
