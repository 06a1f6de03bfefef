package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** emb19 multi-probe LSH operating-point sweep: the IVF sweep's
  * invariants, for the other ANN path — hits AND candidate counts
  * monotone non-decreasing in the probe radius, and the radius = nBits
  * row (every bucket probed) must equal brute force exactly: same
  * candidate set, same (cos desc, vec_id asc) tie-break.
  */
class LshSweepSpec extends AnyFunSuite {

  test("recall and cost monotone in radius; full-radius row equals brute force exactly") {
    val rows = SimilarityOps.lshOperatingPoints(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length >= 4, s"degenerate grid: ${rows.mkString(",")}")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._1 < b._1, "grid not strictly increasing")
        assert(a._2 <= b._2, s"candidate count fell as radius grew: $a -> $b")
        assert(a._4 <= b._4, s"hits fell as radius grew: $a -> $b")
      case _ =>
    }
    val full = rows.last
    assert(full._5 == 10000L,
      s"full-radius LSH must equal brute force, got ${full._5} bp")
    // at full radius every (query, non-self) pair is a candidate
    assert(full._3 >= 9900L, s"full radius did not scan ~the whole corpus: $full")
    // non-vacuity on both axes: radius 0 must be genuinely cheaper AND lossy
    assert(rows.head._3 < full._3 / 2,
      s"radius 0 scans too much — bucketing is not cutting work: ${rows.head}")
    assert(rows.head._5 < 10000L,
      s"radius 0 already exact — fixture cannot price the radius")
  }
}
