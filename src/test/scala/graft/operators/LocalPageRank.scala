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
