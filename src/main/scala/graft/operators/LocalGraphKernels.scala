package graft.operators

/** Single-threaded PageRank mirror — identical arithmetic to
  * GraphOps.pageRank (per-iteration 10 dp HALF_UP rounding, dangling
  * redistribution, final 6 dp). Shared by GraphOpsSpec and the
  * rank-ordered-crawl golden.
  */
object LocalPageRank {
  def compute(edges: Seq[(String, String)], iters: Int,
              damping: Double): Map[String, Double] =
    computeFrom(edges, Map.empty, iters, damping)

  /** Warm-start form mirroring GraphOps.pageRankFrom: nodes in `init`
    * start at that rank, others at the uniform 1/n.
    */
  def computeFrom(edges: Seq[(String, String)], init: Map[String, Double],
                  iters: Int, damping: Double): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toDouble }
    def r10(x: Double) = BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    var ranks = nodes.map(nd => nd -> init.getOrElse(nd, r10(1.0 / n))).toMap
    if (init.nonEmpty) {
      // mirror pageRankFrom's unit-mass re-normalization
      val mass = r10(nodes.map(ranks).sum)
      ranks = ranks.map { case (k, v) => k -> r10(v / mass) }
    }
    for (_ <- 0 until iters) {
      val dangling = nodes.filterNot(outdeg.contains).map(ranks).sum
      val contrib = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
      for ((s, d) <- edges) contrib(d) += ranks(s) / outdeg(s)
      ranks = nodes.map { nd =>
        nd -> r10((1.0 - damping) / n + damping * (contrib(nd) + dangling / n))
      }.toMap
    }
    ranks.map { case (k, v) =>
      k -> BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }
}

/** Single-threaded HITS mirror — identical arithmetic to GraphOps.hits
  * (hub0 = 1.0; per half-step L2 norm rounded 6 dp after sqrt, components
  * 10 dp HALF_UP; final 6 dp). Returns node -> (hub, authority).
  */
object LocalHits {
  def compute(edges: Seq[(String, String)], iters: Int): Map[String, (Double, Double)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    def rd(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    var hub = nodes.map(_ -> 1.0).toMap
    var auth = nodes.map(_ -> 0.0).toMap
    def normalized(raw: Map[String, Double]): Map[String, Double] = {
      val q = rd(math.sqrt(nodes.map(n => { val v = raw.getOrElse(n, 0.0); v * v }).sum), 6)
      val nrm = if (q == 0.0) 1.0 else q
      nodes.map(n => n -> rd(raw.getOrElse(n, 0.0) / nrm, 10)).toMap
    }
    for (_ <- 0 until iters) {
      val araw = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
      for ((s, d) <- edges) araw(d) += hub(s)
      auth = normalized(araw.toMap)
      val hraw = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
      for ((s, d) <- edges) hraw(s) += auth(d)
      hub = normalized(hraw.toMap)
    }
    nodes.map(n => n -> (rd(hub(n), 6), rd(auth(n), 6))).toMap
  }
}

/** Single-threaded TrustRank mirror — identical arithmetic to
  * GraphOps.trustRank (teleport restricted to `trusted`, dangling mass
  * along the trust vector, 10 dp per step, final 6 dp).
  */
object LocalTrustRank {
  def compute(edges: Seq[(String, String)], trusted: String => Boolean,
              iters: Int, damping: Double): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val tCount = nodes.count(trusted).toDouble
    require(tCount > 0)
    def r10(x: Double) = BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tele = nodes.map(n => n -> (if (trusted(n)) 1.0 / tCount else 0.0)).toMap
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toDouble }
    var ranks = nodes.map(n => n -> r10(tele(n))).toMap
    for (_ <- 0 until iters) {
      val dang = nodes.filterNot(outdeg.contains).map(ranks).sum
      val contrib = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
      for ((s, d) <- edges) contrib(d) += ranks(s) / outdeg(s)
      ranks = nodes.map { n =>
        n -> r10((1.0 - damping) * tele(n) +
          damping * (contrib(n) + dang * tele(n)))
      }.toMap
    }
    ranks.map { case (k, v) =>
      k -> BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }
}
