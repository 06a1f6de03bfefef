package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for GraphOps.pageRank: the distributed power iteration must
  * equal a single-threaded mirror with the same per-iteration rounding,
  * exactly — including dangling-mass redistribution.
  */
class GraphOpsSpec extends AnyFunSuite {
  import spark.implicits._

  /** Sequential PageRank mirror — identical arithmetic to GraphOps. */
  private def mirror(edges: Seq[(String, String)], iters: Int,
                     damping: Double): Map[String, Double] =
    LocalPageRank.compute(edges, iters, damping)

  private def run(edges: Seq[(String, String)], iters: Int = 10,
                  damping: Double = 0.85): Map[String, Double] = {
    val df = edges.toDF("src", "dst")
    GraphOps.pageRank(spark, df, iters, damping)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("pageRank equals the sequential mirror on a graph with danglings") {
    // b and e have no out-edges (dangling); c is a hub.
    val edges = Seq(
      "a" -> "b", "a" -> "c", "c" -> "a", "c" -> "b", "c" -> "e",
      "d" -> "c", "d" -> "e", "f" -> "c")
    assert(run(edges) == mirror(edges, 10, 0.85))
  }

  test("pageRank equals the mirror on a ring (uniform fixpoint)") {
    val ring = (0 until 7).map(i => (s"n$i", s"n${(i + 1) % 7}"))
    val got = run(ring)
    assert(got == mirror(ring, 10, 0.85))
    // every node identical on a symmetric ring
    assert(got.values.toSet.size == 1)
  }

  test("ranks sum to ~1 (probability mass conserved)") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "d")
    val total = run(edges, iters = 15).values.sum
    assert(math.abs(total - 1.0) < 1e-4, s"sum=$total")
  }

  test("deterministic across parallelism (local shuffle-partition sweep)") {
    val edges = Seq(
      "a" -> "b", "a" -> "c", "c" -> "a", "c" -> "b", "c" -> "e",
      "d" -> "c", "d" -> "e", "f" -> "c", "g" -> "a", "g" -> "g")
    val base = run(edges)
    graft.SparkTestBase.withShufflePartitions(1) {
      assert(run(edges) == base)
    }
  }
}
