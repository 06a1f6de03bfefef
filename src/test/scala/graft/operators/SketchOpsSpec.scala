package graft.operators

import graft.SparkTestBase.spark
import graft.sources.Gen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the count-min hot-host sketch (c22): the CMS one-sided
  * guarantee (never undercounts) must hold row by row against the exact
  * groupBy counts, the detected hot set must contain every truly-hot host,
  * and a deliberately-undersized sketch must stay one-sided even when
  * bucket collisions are forced.
  */
class SketchOpsSpec extends AnyFunSuite {

  private val N = 20000L

  private def exactCounts(): Map[String, Long] =
    Gen.seedsLocal(N.toInt)
      .groupBy(s => graft.functions.UrlKit.hostOf(
        graft.functions.UrlKit.canonicalize(s.url)))
      .map { case (h, ss) => h -> ss.size.toLong }

  test("c22 estimates never undercount; hot set complete; top-1 exact") {
    val rows = SketchOps.hotHosts(spark, N).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty, "no hot hosts detected on the cubic-skew frontier")
    rows.foreach { case (h, est, exact, over) =>
      assert(est >= exact, s"CMS undercounted $h: est=$est exact=$exact")
      assert(over == est - exact)
    }
    val exact = exactCounts()
    rows.foreach { case (h, _, ex, _) =>
      assert(exact.getOrElse(h, 0L) == ex, s"exact column wrong for $h")
    }
    // completeness: any host whose EXACT count clears the threshold must
    // be in the hot set (est >= exact makes misses impossible — verify)
    val threshold = math.ceil(2.0 * N.toDouble / Gen.NumHosts).toLong
    val trulyHot = exact.filter(_._2 >= threshold).keySet
    assert(trulyHot.nonEmpty && trulyHot.subsetOf(rows.map(_._1).toSet),
      "a truly-hot host was missed")
    // the skewed generator's dominant host ranks first by estimate too
    assert(rows.head._1 == exact.maxBy(e => (e._2, e._1))._1,
      "top-1 by estimate != top-1 by exact count")
  }

  test("c22 one-sided bound survives forced collisions (width 8 << 50 hosts)") {
    val rows = SketchOps.hotHosts(spark, N, depth = 3, width = 8).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (h, est, exact) =>
      assert(est >= exact, s"undersized CMS undercounted $h")
    }
    assert(rows.exists { case (_, est, exact) => est > exact },
      "width 8 with 50 hosts produced zero collisions — bound not exercised")
  }
}
