package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** g09 host-triangle counting: the degree-ordered wedge enumeration must
  * agree exactly with a brute-force local mirror over the same derived
  * host graph (the DuckDB oracle re-checks with the naive triple join at
  * sf0.01; this pins the algebra at sf0.001 plus planted shapes).
  */
class TrianglesSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  /** O(n³) reference over a collected undirected edge set. */
  private def bruteTriangles(edges: Set[(String, String)]): Map[String, Long] = {
    val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .filter { case (a, b) => a != b }
    val adj = und.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val nodes = adj.keys.toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      k <- (j + 1) until nodes.length
      x = nodes(i); y = nodes(j); z = nodes(k)
      if adj(x).contains(y) && adj(y).contains(z) && adj(x).contains(z)
    } {
      counts(x) = counts.getOrElse(x, 0L) + 1
      counts(y) = counts.getOrElse(y, 0L) + 1
      counts(z) = counts.getOrElse(z, 0L) + 1
    }
    counts.toMap
  }

  test("hostTriangles == brute-force mirror on the derived host graph") {
    val edges = GraphOps.denseSourceEdges(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val expected = bruteTriangles(edges)
    val got = GraphOps.hostTriangles(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.nonEmpty, "derived host graph should contain triangles")
    // g01's linear-only lift is triangle-free — the quadratic map is
    // what makes g09 non-vacuous; pin that distinction
    assert(GraphOps.triangleCounts(GraphOps.sourceEdges(spark, dir))
      .count() == 0)
  }

  test("planted K4 + pendant: 3 triangles per clique member, pendant absent") {
    import spark.implicits._
    val hosts = Seq("a.example", "b.example", "c.example", "d.example")
    val k4 = (for { x <- hosts; y <- hosts if x < y } yield (x, y)) ++
      Seq(("d.example", "e.example"), // pendant edge: no triangle
        ("a.example", "b.example"), // duplicate
        ("b.example", "a.example"), // reverse duplicate
        ("c.example", "c.example")) // self-loop
    val got = GraphOps.triangleCounts(k4.toDF("src", "dst")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == hosts.map(_ -> 3L).toMap)
  }

  test("triangle-free graph (star + path) returns zero rows") {
    import spark.implicits._
    val star = Seq(("hub", "s1"), ("hub", "s2"), ("hub", "s3"),
      ("s3", "s4")).toDF("src", "dst")
    assert(GraphOps.triangleCounts(star).count() == 0)
  }
}
