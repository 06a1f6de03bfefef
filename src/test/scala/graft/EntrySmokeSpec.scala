package graft

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry + every query runs on sf0.001 and returns
  * a sane, non-empty (where expected) result. Deep value checks live in the
  * DuckDB oracle (q, t01) and golden suites (c).
  */
class EntrySmokeSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracleSql without query impl: $missing")
  }

  // queries that may legitimately return 0 rows on tiny data
  private val mayBeEmpty = Set("q03_anti_join", "q09_setops")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("similarity: ANN cosine values are a subset-of-corpus sanity check") {
    val brute = graft.operators.SimilarityOps.bruteCosineTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // ANN top-1 can never beat brute top-1 for the same query
    val bruteBest = brute.groupBy(_._1).map { case (q, xs) => q -> xs.map(_._3).max }
    val ann = graft.operators.SimilarityOps.annLshTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    ann.groupBy(_._1).foreach { case (q, xs) =>
      assert(xs.map(_._2).max <= bruteBest(q) + 1e-9)
    }
  }
}
