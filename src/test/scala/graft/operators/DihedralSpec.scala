package graft.operators

import graft.SparkTestBase.spark
import graft.functions.ImageKit
import org.scalatest.funsuite.AnyFunSuite

/** c68 goldens (dihedral copy detection without metadata). Pinned: the
  * orbit kernel respects the D4 algebra (orbit sets are transform-
  * invariant for lossless re-encodes; element 0 is the plain phash; total
  * on garbage); the distributed matcher equals a brute-force
  * min-over-orbit mirror on the planted corpus with every rotate-then-
  * strip repost found; and plain stored-hash blocking provably misses
  * the transpose-family pairs the orbit probe recovers.
  */
class DihedralSpec extends AnyFunSuite {

  private def upright(i: Int, w: Int = 48, h: Int = 32): Array[Int] =
    ImageKit.genPixels(ImageKit.mix64(i * 104729L + 11L), 0, w, h)

  test("orbit kernel: element 0 is plain phash; lossless transforms preserve the orbit set; total on garbage") {
    val px = upright(1)
    val png = ImageKit.encode(px, 48, 32, "png")
    val orbit = ImageKit.dihedralPhashes(png)
    assert(orbit.length == 8)
    assert(orbit(0) == ImageKit.phash64(png))
    for (o <- 2 to 8) {
      val (spx, sw, sh) = ImageKit.storeWithOrientation(px, 48, 32, o)
      val rot = ImageKit.encode(spx, sw, sh, "png")
      assert(ImageKit.dihedralPhashes(rot).toSet == orbit.toSet,
        s"orbit set must be D4-invariant (o=$o)")
    }
    assert(ImageKit.dihedralPhashes(null).toSeq == Seq.fill(8)(0L))
    assert(ImageKit.dihedralPhashes("junk".getBytes).toSeq == Seq.fill(8)(0L))
  }

  test("c68 matcher == brute-force min-over-orbit mirror; every planted repost found; plain blocking blind where expected") {
    val corpus = ImageOps.dihedralCorpus(spark)
    val rows = corpus.collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
    val orbits = rows.map { case (id, b) => id -> ImageKit.dihedralPhashes(b) }
    // mirror the operator's xxhash64(image_id) pair ordering via Spark
    // itself (one tiny local lookup table, not a reimplementation)
    val hashOf = {
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, xxhash64}
      rows.map(_._1).toSeq.toDF("image_id")
        .withColumn("h", xxhash64(col("image_id")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val expected = (for {
      (ia, oa) <- orbits; (ib, ob) <- orbits
      if hashOf(ia) < hashOf(ib)
      dists = oa.zipWithIndex.map { case (h, i) =>
        (java.lang.Long.bitCount(h ^ ob(0)), i + 1)
      }
      best = dists.min
      if best._1 <= 3
    } yield (ia, ib, best._1, best._2,
      java.lang.Long.bitCount(oa(0) ^ ob(0)) > 3)).toSet
    val got = ImageOps.dihedralDemo(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getBoolean(4))).toSet
    assert(got == expected)
    // every planted twin appears in some orientation
    val planted = rows.map(_._1).filter(_.contains("?rot=")).toSet
    val matchedIds = got.flatMap(p => Set(p._1, p._2))
    assert(planted.subsetOf(matchedIds), s"missing: ${planted -- matchedIds}")
    // the transpose-family plants (o in 5..8 swap w/h) are invisible to
    // plain stored-hash matching — the contrast column must say so
    val transposed = got.filter(p => Seq(p._1, p._2).exists(id =>
      Seq("?rot=5", "?rot=6", "?rot=7", "?rot=8").exists(id.endsWith)))
    assert(transposed.nonEmpty && transposed.forall(_._5),
      "transpose-family pairs must be plain_missed")
  }
}
