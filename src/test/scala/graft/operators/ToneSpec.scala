package graft.operators

import graft.SparkTestBase.spark
import graft.functions.ImageKit
import org.scalatest.funsuite.AnyFunSuite

/** c74 goldens (tone-curve-resistant copy detection). Pinned: the
  * equalization invariance LAW — rankNormalize is bit-identical under
  * strictly increasing intensity maps; kernel totality on garbage; the
  * blocked matcher equals a brute all-pairs mirror exactly (pigeonhole
  * recall is certain at hamming <= 3); every planted gamma repost is
  * found; and the plain-phash contrast column is live in BOTH directions
  * (some planted pairs are plain-missed, the mild ones are not).
  */
class ToneSpec extends AnyFunSuite {

  private def basePixels(i: Int): (Array[Int], Int, Int) = {
    val s = graft.sources.Gen.snapshotRow(s"img-$i", 0, 0, "png", 0)
    ImageKit.decodeGray(s.bytes)
  }

  test("equalization invariant under strictly increasing maps (law)") {
    val maps: Seq[Int => Int] =
      Seq(v => v * 3 + 7, v => v * 2, v => v + v / 2, v => v * 4 + 1)
    (0 until 6).foreach { i =>
      val (px, _, _) = basePixels(i)
      val base = ImageKit.rankNormalize(px).toSeq
      maps.zipWithIndex.foreach { case (f, mi) =>
        val mapped = ImageKit.rankNormalize(px.map(f)).toSeq
        assert(mapped == base, s"map $mi broke invariance on img-$i")
      }
    }
  }

  test("kernel total on garbage") {
    assert(ImageKit.phashRank64(Array[Byte](1, 2, 3)) == 0L)
    assert(ImageKit.phashRank64(Array.emptyByteArray) == 0L)
    assert(ImageKit.rankNormalize(Array.emptyIntArray).isEmpty)
  }

  private def mirrorPairs(): Set[(String, String, Int, Boolean)] = {
    val imgs = ImageOps.toneCorpus(spark).collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
    val hashed = imgs.map { case (id, bytes) =>
      val (px, w, h) = ImageKit.decodeGray(bytes)
      (id, ImageKit.phashOfPixels(px, w, h),
        ImageKit.phashOfPixels(ImageKit.rankNormalize(px), w, h),
        CrawlOracle.xxhash64(id))
    }
    (for {
      a <- hashed; b <- hashed
      if a._4 < b._4
      hr = java.lang.Long.bitCount(a._3 ^ b._3)
      if hr <= 3
    } yield (a._1, b._1, hr,
      java.lang.Long.bitCount(a._2 ^ b._2) > 3)).toSet
  }

  test("c74 matcher == brute all-pairs mirror; plants found; contrast live") {
    val got = ImageOps.toneDetectDemo(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getBoolean(3)))
      .toSet
    val mirror = mirrorPairs()
    assert(got == mirror)
    // every planted repost pairs with its base (id prefix match)
    val planted = got.filter { case (a, b, _, _) =>
      a.split('?').head == b.split('?').head && (a.contains("gamma") ^ b.contains("gamma"))
    }
    assert(planted.size == 16, s"expected all 16 gamma reposts, got ${planted.size}")
    assert(planted.exists(_._4), "no planted pair was plain-missed; contrast dead")
    assert(planted.exists(!_._4), "every planted pair plain-missed; column constant")
  }
}
