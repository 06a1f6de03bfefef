package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** g10 k-core decomposition: distributed peeling == a single-threaded
  * peeling mirror, plus closed-form planted structures.
  */
class KCoreSpec extends AnyFunSuite {
  import spark.implicits._

  /** Textbook sequential peeling over a collected edge set. */
  private def localCores(edges: Set[(String, String)]): Map[String, Long] = {
    var adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .filter { case (a, b) => a != b }
      .groupBy(_._1).map { case (n, vs) => n -> vs.map(_._2).to(scala.collection.mutable.Set) }
    val core = scala.collection.mutable.Map.empty[String, Long]
    var k = 1L
    while (adj.nonEmpty) {
      val weak = adj.collect { case (n, ns) if ns.size < k => n }.toSet
      if (weak.isEmpty) k += 1
      else {
        weak.foreach(core(_) = k - 1)
        adj = adj.collect {
          case (n, ns) if !weak(n) => n -> ns.filterNot(weak)
        }
      }
    }
    core.toMap
  }

  test("coreNumbers == sequential peeling mirror on the derived host graph") {
    val edges = GraphOps.denseSourceEdges(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val got = GraphOps.hostCoreNumbers(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == localCores(edges))
    assert(got.values.max >= 2L, "derived graph should have a 2-core")
  }

  test("planted closed forms: K4 core 3, ring core 2, path tail core 1") {
    val hosts = Seq("a", "b", "c", "d")
    val k4 = for { x <- hosts; y <- hosts if x < y } yield (x, y)
    val ring = Seq(("r1", "r2"), ("r2", "r3"), ("r3", "r4"), ("r4", "r1"))
    val path = Seq(("d", "p1"), ("p1", "p2")) // tail hanging off the K4
    val edges = (k4 ++ ring ++ path).toDF("src", "dst")
    val got = GraphOps.coreNumbers(edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hosts.forall(got(_) == 3L), s"K4 members must be core 3: $got")
    assert(Seq("r1", "r2", "r3", "r4").forall(got(_) == 2L),
      s"ring members must be core 2: $got")
    assert(got("p1") == 1L && got("p2") == 1L,
      s"path tail must be core 1: $got")
  }
}
