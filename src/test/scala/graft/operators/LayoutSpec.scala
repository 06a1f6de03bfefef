package graft.operators

import graft.SparkTestBase.spark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q57 goldens (Z-order layout keys). Pinned: the Morton interleave
  * round-trips exactly (gather of even/odd bits recovers both operands
  * over a full-byte sweep and a 16-bit fuzz); the Column form equals the
  * JVM mirror bit-for-bit; and the layout property the key exists for —
  * equal-depth zones of a z-sorted complete grid stay TIGHT on BOTH
  * dimensions while an a-sorted layout leaves the b dimension at full
  * domain span.
  */
class LayoutSpec extends AnyFunSuite {

  test("morton kernel: round-trip exact; column == mirror bit-for-bit") {
    for (a <- 0L to 255L; b <- Seq(0L, 1L, 37L, 200L, 255L)) {
      val z = LayoutOps.zorder16Local(a, b)
      assert(LayoutOps.gather16Local(z) == a)
      assert(LayoutOps.gather16Local(z >> 1) == b)
    }
    for (k <- 0 until 500) {
      val a = graft.functions.ImageKit.mix64(k * 2L + 1) & 0xFFFFL
      val b = graft.functions.ImageKit.mix64(k * 2L + 2) & 0xFFFFL
      val z = LayoutOps.zorder16Local(a, b)
      assert(LayoutOps.gather16Local(z) == a &&
        LayoutOps.gather16Local(z >> 1) == b, s"fuzz a=$a b=$b")
    }
    val df = spark.range(0, 4096).select(
      pmod(xxhash64(col("id")), lit(65536L)).as("a"),
      pmod(xxhash64(col("id") + 1), lit(65536L)).as("b"))
    val got = df.select(col("a"), col("b"),
        LayoutOps.zorder16(col("a"), col("b")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == LayoutOps.zorder16Local(r.getLong(0), r.getLong(1)))
    }
  }

  test("zone property: z-sorted zones tight on BOTH dims, a-sorted full-span on b") {
    val n = 256
    val grid = for (a <- 0 until n; b <- 0 until n) yield (a.toLong, b.toLong)
    def spans(rows: Seq[(Long, Long)], zones: Int): Seq[(Long, Long)] = {
      val per = rows.length / zones
      rows.grouped(per).take(zones).map { zone =>
        (zone.map(_._1).max - zone.map(_._1).min,
          zone.map(_._2).max - zone.map(_._2).min)
      }.toSeq
    }
    val zSorted = grid.sortBy { case (a, b) =>
      (LayoutOps.zorder16Local(a, b), a, b)
    }
    val aSorted = grid.sortBy(identity)
    val zSpans = spans(zSorted, 64)
    val aSpans = spans(aSorted, 64)
    // a complete 256x256 grid cut into 64 equal-depth z zones aligns to
    // 32x32 curve blocks: both spans stay at 31
    assert(zSpans.forall { case (sa, sb) => sa <= 32 && sb <= 32 }, zSpans)
    // the single-column sort leaves b at full domain span in every zone
    assert(aSpans.forall { case (_, sb) => sb == (n - 1).toLong })
  }

  test("q57 zones cover all rows with n_rows near-equal depth") {
    val zones = LayoutOps.zorderZones(spark, "/root/testdata/sf0.001")
      .collect()
    assert(zones.length == 32)
    val counts = zones.map(_.getLong(1))
    assert(counts.max - counts.min <= 1, "ntile must be equal-depth")
  }
}
