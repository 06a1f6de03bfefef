package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** c42 — HTTP redirect-chain resolution (the alias step every crawler runs
  * between fetch and snapshot: a URL that 301s is an alias of its target,
  * the frontier must credit the TARGET, and a redirect loop — or a chain
  * past the hop budget — is a fetch failure, not a page). The reference
  * pipeline would resolve chains imperatively per URL; relationally the
  * whole frontier resolves in HOP-BUDGET rounds of one equi-join each.
  *
  * Plan shape: the successor table carries (src, dst) longs only; each of
  * the `maxHops` rounds is ONE left equi-join of the (id, cur) state
  * against it — chains in the wild are short (crawlers cap redirects at
  * 5-10, as we do here), so the round count is a small CONSTANT, not a
  * function of corpus size, and rows that already terminated join against
  * nothing (null dst) and pass through unchanged. A pointer-doubling
  * formulation (O(log budget) rounds) buys nothing at budget 8 and costs
  * an extra self-join per round — considered and rejected.
  *
  * The hop-budget-exhausted verdict (`exceeded`) deliberately conflates
  * genuine loops with too-long chains: that is exactly the crawler policy
  * ("too many redirects"), and it is what makes the operator total on
  * adversarial graphs without cycle detection state.
  *
  * Redirect edges are synthesized deterministically from the documents
  * table (chains of length <= 4 ending at multiples of 5; every 10th
  * block rewired into a 5-cycle) so DuckDB re-derives the identical graph
  * and the whole result — final target, hop count, loop verdict — sits in
  * the HARD oracle gate via a recursive-CTE walk.
  */
object RedirectOps {

  /** dst(src): src-1 while src is not a multiple of 5 (chain toward the
    * block base); block bases of every 10th block point back up (5-cycle);
    * all other bases are terminal (no row).
    */
  private def edges(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("src"),
        expr("CASE WHEN doc_id % 5 <> 0 THEN doc_id - 1 " +
          "WHEN (doc_id div 5) % 10 = 9 THEN doc_id + 4 ELSE NULL END").as("dst"))
      .where(col("dst").isNotNull)

  def resolveRedirects(spark: SparkSession, dir: String, maxHops: Int = 8): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
    resolveAgainst(docs, edges(docs), maxHops)
  }

  /** Resolve every id through the successor table: (id, final_id, n_hops,
    * exceeded). Deterministic — each node has at most one successor.
    */
  def resolveAgainst(ids: DataFrame, edges: DataFrame, maxHops: Int): DataFrame = {
    var state = ids.select(col("doc_id").as("id"), col("doc_id").as("cur"),
      lit(0).as("hops"))
    (1 to maxHops).foreach { _ =>
      // fresh column names per round: the successor table appears maxHops
      // times in one plan, so positional DataFrame refs would be ambiguous
      val e = edges.select(col("src").as("e_src"), col("dst").as("e_dst"))
      state = state.join(e, col("cur") === col("e_src"), "left")
        .select(col("id"),
          coalesce(col("e_dst"), col("cur")).as("cur"),
          when(col("e_dst").isNotNull, col("hops") + 1).otherwise(col("hops")).as("hops"))
    }
    state.select(col("id"), col("cur").as("final_id"),
      col("hops").cast("int").as("n_hops"),
      (col("hops") >= maxHops).as("exceeded"))
  }
}
