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

  test("distributed loop path (gate forced off) equals the local mirror") {
    // r06: small graphs run the driver-local kernel; pin that the
    // DISTRIBUTED iteration still produces the identical table when the
    // gate is disabled (spark.graft.smallGraphLimit=0), for pageRank,
    // HITS and TrustRank — the invariant the local fast path rests on.
    val edges = Seq(
      "a" -> "b", "a" -> "c", "c" -> "a", "c" -> "b", "c" -> "e",
      "d" -> "c", "d" -> "e", "f" -> "c", "b0" -> "a", "a" -> "b0")
    spark.conf.set("spark.graft.smallGraphLimit", "0")
    try {
      val viaCluster = run(edges)
      val viaHits = GraphOps.hits(spark, edges.toDF("src", "dst"), 4)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val viaTrust = GraphOps.trustRank(spark, edges.toDF("src", "dst"),
          c => c.endsWith("0"), 6, 0.85)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(viaCluster == mirror(edges, 10, 0.85))
      assert(viaHits == LocalHits.compute(edges, 4))
      assert(viaTrust == LocalTrustRank.compute(edges, _.endsWith("0"), 6, 0.85))
    } finally spark.conf.unset("spark.graft.smallGraphLimit")
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

  // g03 warm-start fixtures: a 30-node base graph and a grown graph with
  // a SMALL delta (one new node, three new edges) — the realistic shape:
  // a crawl's host graph gains a little per epoch, it doesn't churn
  private val baseEdges: Seq[(String, String)] =
    (0 until 30).flatMap(i =>
      Seq(s"n$i" -> s"n${(i * 7 + 3) % 30}", s"n$i" -> s"n${(i + 1) % 30}"))
      .filter(e => e._1 != e._2).distinct
  private val grownEdges = baseEdges ++ Seq(
    "n0" -> "nx", "nx" -> "n5", "n3" -> "n9")

  test("warm-start refresh == sequential mirror from the same init (exact)") {
    val init = run(baseEdges, iters = 6)
    val got = GraphOps.pageRankFrom(spark, grownEdges.toDF("src", "dst"),
        Some(init.toSeq.toDF("node", "pagerank")), iters = 3, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = LocalPageRank.computeFrom(grownEdges, init, iters = 3, damping = 0.85)
    assert(got == want, "distributed warm refresh != mirror")
    // the new node exists in the refresh even though the init lacks it
    assert(got.contains("nx"))
  }

  test("warm start converges strictly faster than a cold start (3 iters)") {
    // reference fixpoint: 60 iterations is far past convergence at 0.85
    val ref = LocalPageRank.compute(grownEdges, iters = 60, damping = 0.85)
    val init = LocalPageRank.compute(baseEdges, iters = 12, damping = 0.85)
    val warm = LocalPageRank.computeFrom(grownEdges, init, iters = 3, damping = 0.85)
    val cold = LocalPageRank.compute(grownEdges, iters = 3, damping = 0.85)
    def dist(a: Map[String, Double]) =
      ref.map { case (k, v) => math.abs(a(k) - v) }.max
    assert(warm != cold, "warm and cold 3-iter results identical — vacuous")
    assert(dist(warm) < dist(cold),
      f"warm ${dist(warm)}%.2e not closer to fixpoint than cold ${dist(cold)}%.2e")
  }

  test("host-rank store roundtrip + g03 demo query shape") {
    val root = graft.SparkTestBase.tempDir("graft-ranks")
    val r0 = GraphOps.pageRank(spark, baseEdges.toDF("src", "dst"), 6, 0.85)
    GraphOps.writeHostRanks(r0, root, epoch = 0)
    val back = GraphOps.readHostRanks(spark, root, 0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(back == r0.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap)
    val demo = GraphOps.incrementalHostRank(spark, "/root/testdata/sf0.001")
    val rows = demo.collect()
    assert(rows.nonEmpty && rows.map(_.getString(0)).toSeq.sorted ==
      rows.map(_.getString(0)).toSeq, "g03 output not source-ordered")
  }

  // ---- g04: HITS ------------------------------------------------------

  private def runHits(edges: Seq[(String, String)],
                      iters: Int = 8): Map[String, (Double, Double)] = {
    val df = edges.toDF("src", "dst")
    GraphOps.hits(spark, df, iters)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
  }

  test("hits equals the sequential mirror on a graph with danglings") {
    val edges = Seq(
      "a" -> "b", "a" -> "c", "c" -> "a", "c" -> "b", "c" -> "e",
      "d" -> "c", "d" -> "e", "f" -> "c", "g" -> "a", "g" -> "g")
    assert(runHits(edges) == LocalHits.compute(edges, 8))
  }

  test("hits separates hubs from authorities on a bipartite star") {
    // h1..h3 all point at the single authority x; x points nowhere.
    val edges = Seq("h1" -> "x", "h2" -> "x", "h3" -> "x")
    val got = runHits(edges, iters = 4)
    assert(got == LocalHits.compute(edges, 4))
    val (xHub, xAuth) = got("x")
    assert(xAuth == 1.0 && xHub == 0.0, s"authority x got $got")
    // the three symmetric hubs share one hub score (1/sqrt(3)) and have
    // zero authority (nothing points at them)
    val hubs = Seq("h1", "h2", "h3").map(got)
    assert(hubs.toSet.size == 1 && hubs.head._1 > 0.5 && hubs.head._2 == 0.0)
  }

  test("hits L2 invariant: hub and authority vectors have unit norm") {
    val edges = (0 until 20).flatMap(i =>
      Seq(s"n$i" -> s"n${(i * 7 + 3) % 20}", s"n$i" -> s"n${(i + 2) % 20}"))
      .filter(e => e._1 != e._2).distinct
    val got = runHits(edges)
    val h2 = got.values.map { case (h, _) => h * h }.sum
    val a2 = got.values.map { case (_, a) => a * a }.sum
    assert(math.abs(h2 - 1.0) < 1e-4, s"hub norm^2 = $h2")
    assert(math.abs(a2 - 1.0) < 1e-4, s"auth norm^2 = $a2")
  }

  test("g05 host components == BFS mirror on the real edge derivation") {
    val dir = "/root/testdata/sf0.001"
    val edges = GraphOps.sourceEdges(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)))
    // undirected BFS mirror: component = min reachable host
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    def compOf(start: String): String = {
      var seen = Set(start); var frontier = Set(start)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
        seen ++= frontier
      }
      seen.min
    }
    val want = adj.keys.map(h => h -> compOf(h)).toMap
    val got = GraphOps.hostComponents(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == want)
  }

  // ---- g06: TrustRank ---------------------------------------------------

  private def runTrust(edges: Seq[(String, String)], trusted: String => Boolean,
                       iters: Int = 10): Map[String, Double] = {
    import org.apache.spark.sql.functions.{col, substring}
    val trustedNames = (edges.map(_._1) ++ edges.map(_._2)).distinct.filter(trusted)
    GraphOps.trustRank(spark, edges.toDF("src", "dst"),
        node => node.isin(trustedNames: _*), iters, 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("trustRank equals the sequential mirror (danglings + trust teleport)") {
    val edges = Seq(
      "t0" -> "a", "a" -> "b", "b" -> "t0", "t0" -> "c", "c" -> "d",
      "d" -> "a", "e" -> "t0")
    val trusted = Set("t0")
    assert(runTrust(edges, trusted) ==
      LocalTrustRank.compute(edges, trusted, 10, 0.85))
  }

  test("a link farm unreachable from the trust set converges to rank 0") {
    // trusted cluster t0->a->t0 ... spam farm s1<->s2<->s3 self-citing,
    // with a link INTO the trusted cluster but none back
    val edges = Seq(
      "t0" -> "a", "a" -> "t0",
      "s1" -> "s2", "s2" -> "s3", "s3" -> "s1", "s1" -> "a")
    val trusted = Set("t0")
    val got = runTrust(edges, trusted, iters = 30)
    assert(got == LocalTrustRank.compute(edges, trusted, 30, 0.85))
    assert(Seq("s1", "s2", "s3").forall(got(_) == 0.0),
      s"spam farm holds trust mass: $got")
    assert(got("t0") > 0.3 && got("a") > 0.3, s"trusted cluster drained: $got")
    // plain PageRank, by contrast, gives the farm substantial mass —
    // the semantics g06 adds over g01
    val pr = run(edges, iters = 30)
    assert(Seq("s1", "s2", "s3").map(pr).sum > 0.2,
      "fixture too weak: PageRank does not reward the farm")
  }

  test("c34 budget apportionment == sequential mirror; sums exactly to budget") {
    val dir = "/root/testdata/sf0.001"
    val budget = 1000L
    val ranks = GraphOps.hostPageRank(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    // sequential largest-remainder mirror over the SAME rank table
    val ms = ranks.map { case (h, r) => h -> math.round(r * 1e6) }
    val mm = ms.map(_._2).sum
    val based = ms.map { case (h, m) =>
      (h, m, (m * budget) / mm, m * budget - ((m * budget) / mm) * mm)
    }
    val extras = budget - based.map(_._3).sum
    val byRem = based.sortBy { case (h, _, _, rem) => (-rem, h) }
      .zipWithIndex
      .map { case ((h, m, base, _), i) =>
        h -> (m, base + (if (i < extras) 1L else 0L))
      }.toMap
    val got = GraphOps.budgetAllocation(spark, dir, budget).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == byRem)
    assert(got.values.map(_._2).sum == budget, "slots leaked or invented")
    // authority differentiates WHERE the rank spread warrants a slot:
    // on this near-regular citation graph ranks can be uniform, so the
    // assert is conditional on the spread exceeding one budget quantum
    val top = got.maxBy(_._2._1)._2
    val bot = got.minBy(_._2._1)._2
    if (top._1 - bot._1 > mm / budget)
      assert(top._2 > bot._2, s"allocation flat despite spread: $top vs $bot")
    // and a synthetic skewed rank table MUST differentiate (non-vacuous
    // path for the apportionment arithmetic itself)
    val skewMs = Seq("a" -> 500000L, "b" -> 300000L, "c" -> 200000L)
    val skewMm = skewMs.map(_._2).sum
    val bases = skewMs.map { case (h, m) => (h, (m * 10L) / skewMm) }
    assert(bases.map(_._2) == Seq(5L, 3L, 2L))
  }

  test("hits deterministic across parallelism") {
    val edges = Seq(
      "a" -> "b", "a" -> "c", "c" -> "a", "c" -> "b", "c" -> "e",
      "d" -> "c", "d" -> "e", "f" -> "c")
    val base = runHits(edges)
    graft.SparkTestBase.withShufflePartitions(1) {
      assert(runHits(edges) == base)
    }
  }
}
