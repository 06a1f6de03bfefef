package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** emb18 IVF operating-point sweep: the curve must be internally
  * consistent — hits monotone non-decreasing in the probe budget — and
  * END at brute-force equality: the grid's last row probes every list,
  * where IVF degenerates to exhaustive search by construction, so its
  * recall MUST be exactly 10000 bp (same candidate set, same
  * (cos desc, vec_id asc) tie-break as the brute-force truth).
  */
class IvfSweepSpec extends AnyFunSuite {

  test("recall monotone in probe count; full-probe row equals brute force exactly") {
    val rows = SimilarityOps.ivfOperatingPoints(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length >= 3, s"degenerate grid: ${rows.mkString(",")}")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._1 < b._1, "grid not strictly increasing")
        assert(a._4 <= b._4,
          s"hits fell as the probe budget grew: $a -> $b")
      case _ =>
    }
    val full = rows.last
    assert(full._1 == full._2, s"last row must probe every list: $full")
    assert(full._3 == 10000L, s"full probe must scan the whole corpus: $full")
    assert(full._5 == 10000L,
      s"full-probe IVF must equal brute force, got ${full._5} bp")
    // non-vacuity: the curve must actually be a curve — the smallest
    // budget loses recall vs exhaustive search on this corpus
    assert(rows.head._5 < 10000L,
      s"p=${rows.head._1} already exact — fixture cannot price the probe budget")
  }
}
