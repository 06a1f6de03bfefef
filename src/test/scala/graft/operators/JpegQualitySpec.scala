package graft.operators

import graft.SparkTestBase.spark
import graft.functions.ImageKit
import org.scalatest.funsuite.AnyFunSuite

/** c66 goldens (JPEG encode-quality estimation). Pinned: inverting the
  * luminance DQT recovers the JDK writer's actual IJG quality to +-1
  * across the whole useful range and is strictly monotone in it; the
  * walk is total on garbage/truncations/non-JPEGs; and the audit column
  * equals a per-row kernel mirror with every planted re-encode flagged
  * LOW and no clean row flagged.
  */
class JpegQualitySpec extends AnyFunSuite {

  private def px(seed: Long) = ImageKit.genPixels(ImageKit.mix64(seed), 0, 48, 32)

  test("estimate within +-1 of the actual encode quality, strictly monotone") {
    val qs = Seq(20, 30, 40, 50, 60, 75, 85, 95)
    val ests = qs.map { q =>
      val bytes = ImageKit.encodeJpegQuality(px(11L), 48, 32, q / 100.0f)
      val est = ImageKit.jpegQualityEstimate(bytes)
      assert(math.abs(est - q) <= 1, s"q=$q est=$est")
      est
    }
    assert(ests == ests.sorted && ests.distinct.size == ests.size,
      s"estimates not strictly monotone: $ests")
  }

  test("total on non-JPEG / truncated / garbage payloads") {
    assert(ImageKit.jpegQualityEstimate(null) == -1)
    assert(ImageKit.jpegQualityEstimate(Array.emptyByteArray) == -1)
    assert(ImageKit.jpegQualityEstimate("not an image".getBytes) == -1)
    assert(ImageKit.jpegQualityEstimate(
      ImageKit.encode(px(12L), 48, 32, "png")) == -1)
    val jpg = ImageKit.encodeJpegQuality(px(13L), 48, 32, 0.8f)
    for (k <- 0 until math.min(jpg.length, 700))
      ImageKit.jpegQualityEstimate(jpg.take(k))
    // EXIF splice must not perturb the estimate (segments coexist)
    val tagged = ImageKit.spliceExifJpeg(jpg, 6, bigEndian = true)
    assert(ImageKit.jpegQualityEstimate(tagged) ==
      ImageKit.jpegQualityEstimate(jpg))
  }

  test("audit == kernel mirror; every planted re-encode LOW, clean rows admitted") {
    val n = 72
    val got = ImageOps.qualityAuditDemo(spark).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(got.size == n)
    val local = ImageOps.qualityCorpus(spark, n).collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
    local.foreach { case (id, bytes) =>
      val est = ImageKit.jpegQualityEstimate(bytes)
      assert(got(id) == ((est, est >= 1 && est < 60)), s"audit row $id")
    }
    (0 until n).foreach { i =>
      val (est, low) = got(s"img-$i")
      if (i % 4 == 0) assert(low && est <= 51, s"re-encode plant img-$i admitted")
      else if (i % 9 == 0) assert(est == -1 && !low, s"png row img-$i")
      else assert(!low && est >= 90, s"clean row img-$i flagged")
    }
  }
}
