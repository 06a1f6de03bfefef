package graft.operators

import graft.SparkTestBase.spark
import graft.functions.ImageKit
import org.scalatest.funsuite.AnyFunSuite

/** c64 goldens (EXIF orientation). Pinned: the tag walk round-trips a
  * spliced APP1 segment for every orientation in BOTH TIFF endiannesses
  * and is total on garbage; the display transform obeys the CIPA DC-008
  * algebra (store-then-apply is the identity, dims swap for the
  * transpose family); spliced files still decode and still header-sniff
  * (c63 coexists); and the distributed matcher equals a brute-force
  * oriented-kernel mirror with every planted camera-rotated repost found
  * — invisibly to plain phash for the rotation family.
  */
class ExifSpec extends AnyFunSuite {

  private def upright(i: Int, w: Int = 48, h: Int = 32): Array[Int] =
    ImageKit.genPixels(ImageKit.mix64(i * 7919L + 3L), 0, w, h)

  test("orientation tag round-trips through splice for 1..8, both endiannesses") {
    val jpeg = ImageKit.encode(upright(1), 48, 32, "jpeg")
    for (o <- 1 to 8; be <- Seq(true, false)) {
      val tagged = ImageKit.spliceExifJpeg(jpeg, o, be)
      assert(ImageKit.exifOrientation(tagged) == o, s"o=$o be=$be")
    }
    assert(ImageKit.exifOrientation(jpeg) == 0, "untagged jpeg")
    val png = ImageKit.encode(upright(2), 48, 32, "png")
    assert(ImageKit.exifOrientation(png) == 0, "png has no EXIF")
    assert(ImageKit.exifOrientation(null) == 0)
    assert(ImageKit.exifOrientation(Array.emptyByteArray) == 0)
    assert(ImageKit.exifOrientation("garbage".getBytes) == 0)
    // truncation at every point of the tagged header must stay total
    val tagged = ImageKit.spliceExifJpeg(jpeg, 6, bigEndian = true)
    for (k <- 0 until 48) ImageKit.exifOrientation(tagged.take(k))
  }

  test("spliced EXIF coexists with decode and the c63 header sniff") {
    val px = upright(3)
    val jpeg = ImageKit.encode(px, 48, 32, "jpeg")
    val tagged = ImageKit.spliceExifJpeg(jpeg, 8, bigEndian = false)
    val (dpx, dw, dh) = ImageKit.decodeGray(tagged)
    assert((dw, dh) == ((48, 32)), "ImageIO must ignore APP1")
    val (opx, ow, oh) = ImageKit.decodeGray(jpeg)
    assert(dpx.sameElements(opx) && ow == 48 && oh == 32,
      "APP1 splice must not perturb the pixel stream")
    val packed = ImageKit.headerDims64(tagged)
    assert(ImageKit.dimsW(packed) == 48 && ImageKit.dimsH(packed) == 32,
      "c63's marker walk must skip the spliced segment")
  }

  test("transform algebra: store-then-apply is identity; dims swap on 5..8") {
    val w = 48; val h = 32
    val px = upright(4, w, h)
    for (o <- 1 to 8) {
      val (spx, sw, sh) = ImageKit.storeWithOrientation(px, w, h, o)
      if (o >= 5) assert((sw, sh) == ((h, w)), s"o=$o stored dims")
      else assert((sw, sh) == ((w, h)), s"o=$o stored dims")
      val (rpx, rw, rh) = ImageKit.applyOrientation(spx, sw, sh, o)
      assert(rw == w && rh == h && rpx.sameElements(px), s"o=$o round trip")
    }
    // 2,3,4,5,7 are involutions of the DISPLAY transform itself
    for (o <- Seq(2, 3, 4, 5, 7)) {
      val (t1, w1, h1) = ImageKit.applyOrientation(px, w, h, o)
      val (t2, w2, h2) = ImageKit.applyOrientation(t1, w1, h1, o)
      assert(w2 == w && h2 == h && t2.sameElements(px), s"o=$o involution")
    }
  }

  test("audit columns == per-row kernel mirror over the corpus") {
    val corpus = ImageOps.orientationCorpus(spark)
    val got = ImageOps.orientationAudit(corpus).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap
    val local = corpus.collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
    assert(local.length == got.size)
    local.foreach { case (id, bytes) =>
      val o = ImageKit.exifOrientation(bytes)
      val (px, w, h) = ImageKit.decodeGray(bytes)
      val plain = ImageKit.phashOfPixels(px, w, h)
      val (dpx, dw, dh) = ImageKit.applyOrientation(px, w, h, o)
      val oriented = ImageKit.phashOfPixels(dpx, dw, dh)
      assert(got(id) == ((o, plain, oriented)), s"audit row $id")
    }
  }

  test("matches == brute oriented mirror; every rotated repost found, rotation family invisible to plain phash") {
    val corpus = ImageOps.orientationCorpus(spark)
    val got = ImageOps.orientationDemo(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getInt(3), r.getBoolean(4)))
    // brute mirror over the oriented kernel
    val local = corpus.collect()
      .map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val (px, w, h) = ImageKit.decodeGray(bytes)
        val o = ImageKit.exifOrientation(bytes)
        val (dpx, dw, dh) = ImageKit.applyOrientation(px, w, h, o)
        (r.getString(0), ImageKit.phashOfPixels(px, w, h),
          ImageKit.phashOfPixels(dpx, dw, dh), o)
      }.sortBy(_._1)
    // pair orientation mirrors nearDupPhash: a precedes b by xxhash64(id)
    val brute = for {
      a <- local; b <- local
      if CrawlOracle.xxhash64(a._1) < CrawlOracle.xxhash64(b._1)
      d = ImageKit.hamming64(a._3, b._3) if d <= 3
    } yield (a._1, b._1, d, b._4, ImageKit.hamming64(a._2, b._2) > 3)
    assert(got.toSet == brute.toSet, "distributed != brute mirror")
    // plant accounting: every 3rd base pairs with exactly its tagged twin
    // (pair orientation is hash-order, so compare as unordered sets)
    val pairs = got.map(p => Set(p._1, p._2)).toSet
    val n = 42
    (0 until n by 3).foreach { i =>
      val o = 2 + i % 7
      assert(pairs.contains(Set(s"img-$i", s"img-$i?exif=$o")),
        s"rotated repost of img-$i not paired")
    }
    assert(pairs.size == (0 until n by 3).size, "spurious cross-image pair")
    // the transpose family (o>=5) rotates the grid — plain phash blind
    def plantO(p: (String, String, Int, Int, Boolean)): Int =
      Seq(p._1, p._2).collectFirst {
        case id if id.contains("?exif=") => id.split("=")(1).toInt
      }.getOrElse(1)
    got.filter(p => plantO(p) >= 5).foreach { p =>
      assert(p._5, s"rotated pair ${p._1} should be invisible to plain phash")
    }
  }
}
