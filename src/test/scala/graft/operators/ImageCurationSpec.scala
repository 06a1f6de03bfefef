package graft.operators

import graft.SparkTestBase.spark
import graft.functions.ImageKit
import org.scalatest.funsuite.AnyFunSuite

/** c36 goldens: curation must equal a single-threaded mirror that
  * recomputes every gate (including the decoded-pixel contrast) from the
  * same deterministic rows, each planted failure family must actually
  * drop rows, and unplanted rows must all survive.
  */
class ImageCurationSpec extends AnyFunSuite {
  private val n = 800

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def mirrorRow(i: Long): (String, Int, Int, Int, Int, Double, Int) = {
    val s = ImageOps.curationRowOf(i)
    val (px, w, h) = ImageKit.decodeGray(s.bytes)
    val contrast = if (w == 0 || h == 0) 0.0 else {
      val pooled = ImageKit.resampleArea(px, w, h, ImageOps.GridSize, ImageOps.GridSize)
      val mean = pooled.sum / pooled.length
      round4(math.sqrt(pooled.map(v => (v - mean) * (v - mean)).sum / pooled.length))
    }
    val minSide = math.min(s.w, s.h)
    val aspect = math.max(s.w, s.h) * 100 / math.min(s.w, s.h)
    val capTokens = s.caption.split(" ", -1).length
    val aligned = if (s.caption.startsWith(s"caption of ${s.image_id} ")) 1 else 0
    val kept = if (minSide >= 24 && aspect <= 200 && capTokens >= 3 &&
      aligned == 1 && contrast >= 2.0) 1 else 0
    (s.image_id, minSide, aspect, capTokens, aligned, contrast, kept)
  }

  test("c36 curation == single-threaded mirror exactly") {
    val got = ImageOps.curateImages(spark, n).collect()
      .map(r => r.getString(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getDouble(5), r.getInt(6)))
      .toMap
    val want = (0L until n.toLong).map { i =>
      val m = mirrorRow(i)
      m._1 -> (m._2, m._3, m._4, m._5, m._6, m._7)
    }.toMap
    assert(got == want)
  }

  test("every planted failure family drops; unplanted rows survive") {
    val kept = ImageOps.curateImages(spark, n).collect()
      .map(r => r.getString(0) -> r.getInt(6)).toMap
    def id(i: Long) = s"img-$i"
    val fams = Map(
      "resolution" -> (0L until n.toLong).filter(_ % 13 == 0),
      "aspect" -> (0L until n.toLong).filter(i => i % 17 == 0 && i % 13 != 0),
      "caption" -> (0L until n.toLong).filter(_ % 19 == 0),
      "aligned" -> (0L until n.toLong).filter(i => i % 23 == 0 && i % 19 != 0),
      "flat" -> (0L until n.toLong).filter(_ % 29 == 0))
    fams.foreach { case (fam, ids) =>
      assert(ids.nonEmpty, s"family $fam vacuous")
      ids.foreach(i => assert(kept(id(i)) == 0, s"$fam plant $i survived"))
    }
    val planted = fams.values.flatten.toSet
    (0L until n.toLong).filterNot(planted).foreach { i =>
      assert(kept(id(i)) == 1, s"unplanted row $i was dropped")
    }
  }

  test("contrast gate separates cleanly (flat << 2.0 <= natural)") {
    val rows = ImageOps.curateImages(spark, n).collect()
      .map(r => (r.getString(0), r.getDouble(5)))
    val flatIds = (0L until n.toLong).filter(_ % 29 == 0).map(i => s"img-$i").toSet
    val (flat, natural) = rows.partition(r => flatIds(r._1))
    assert(flat.forall(_._2 < 2.0), s"a flat image has contrast >= 2: ${flat.filter(_._2 >= 2.0).take(3).toSeq}")
    assert(natural.forall(_._2 >= 2.0), s"a natural image below the floor: ${natural.filter(_._2 < 2.0).take(3).toSeq}")
  }
}
