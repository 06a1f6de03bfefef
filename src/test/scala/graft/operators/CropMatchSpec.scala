package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** c46 goldens (crop-resistant tiled phash). Pinned: the match set equals
  * a brute-force all-pairs all-tiles mirror over the SAME tile kernel;
  * every planted crop is found against its source at the correct tile
  * pair with Hamming 0 (png crops round-trip pixel-exact); and the
  * CONTRAST — every planted crop's whole-image phash is farther than the
  * threshold from its source's, so whole-hash dedup (c17 semantics)
  * misses every one of them.
  */
class CropMatchSpec extends AnyFunSuite {
  private val tau = 3
  private val n = 48

  private def corpus(): Array[(String, Array[Byte])] =
    ImageOps.cropCorpus(spark, n).collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1)))

  test("c46 matches == brute-force all-pairs all-tiles mirror") {
    val imgs = corpus()
    val tiles = imgs.flatMap { case (id, b) =>
      ImageOps.tileHashesOf(b).map { case (t, h) => (id, t, h) }
    }
    val want = (for {
      a <- tiles; b <- tiles
      ha = graft.operators.CrawlOracle.xxhash64(a._1)
      hb = graft.operators.CrawlOracle.xxhash64(b._1)
      if ha < hb
      d = java.lang.Long.bitCount(a._3 ^ b._3)
      if d <= tau
      // certain-recall region only: the blocked join guarantees pairs
      // within tau share a 16-bit block, which bitCount <= 3 implies
    } yield (a._1, b._1, a._2, b._2, d)).toSet
    val got = ImageOps.cropDetectDemo(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getInt(4))).toSet
    assert(got == want)
    assert(got.nonEmpty, "fixture vacuous")
  }

  test("planted crops: found at the right tile pair; whole-hash dedup misses them") {
    val imgs = corpus().toMap
    val byWhole = imgs.map { case (id, b) =>
      id -> ImageOps.tileHashesOf(b).toMap
    }
    val matches = ImageOps.cropDetectDemo(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getInt(4)))
    val plantedPairs = (0 until n).flatMap { i =>
      if (i % 4 == 0) Some((s"img-$i", s"img-$i?crop=tl", 1))
      else if (i % 4 == 1) Some((s"img-$i", s"img-$i?crop=br", 4))
      else None
    }
    assert(plantedPairs.size >= 20, "fixture too small")
    plantedPairs.foreach { case (src, crop, srcTile) =>
      // source's quadrant tile == crop's whole tile, exactly (png)
      val hit = matches.exists { m =>
        val pair = Set(m._1, m._2) == Set(src, crop)
        val tilesOk = (m._1 == src && m._3 == srcTile && m._4 == 0) ||
          (m._2 == src && m._4 == srcTile && m._3 == 0) ||
          (m._1 == crop && m._3 == 0 && m._4 == srcTile) ||
          (m._2 == crop && m._4 == 0 && m._3 == srcTile)
        pair && tilesOk && m._5 == 0
      }
      assert(hit, s"crop $crop not matched to $src at tile $srcTile")
      // the whole-image hashes are far apart: c17-style dedup is blind
      val d = java.lang.Long.bitCount(
        byWhole(src)(0) ^ byWhole(crop)(0))
      assert(d > tau, s"whole-hash contrast broken for $crop (hamming $d)")
    }
  }
}
