package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** c73 — rel=canonical consolidation (the page-level alias channel next to
  * c42's HTTP-level one: the duplicate-content pages a site serves —
  * mobile/AMP/print/tracking variants — declare `<link rel="canonical">`
  * to the page that should receive the crawl credit, and every production
  * crawler folds both channels into ONE alias identity before dedupe,
  * else the seen set and the revision chains fragment across variants).
  *
  * Composition semantics: an HTTP redirect fires BEFORE the page body is
  * ever seen, so a URL that redirects can never expose its own canonical
  * tag — the combined successor is redirect-if-present, else canonical;
  * and a canonical TARGET may itself redirect (the tag points at a moved
  * page), so resolution is a walk over the combined edge table, not two
  * separate passes. RedirectOps.resolveAgainst is reused verbatim: the
  * hop budget bounds adversarial loops (canonical cycles exist in the
  * wild), and each round is ONE equi-join of (id, cur) longs against an
  * edge table — no payloads, constant rounds.
  *
  * The consolidation ACTION is the group fold: every id resolving to the
  * same final target is one identity; n_aliases (group size) is the
  * window count crawl dedupe and revision-chain assignment key on.
  *
  * Canonical edges are synthesized deterministically on redirect-TERMINAL
  * docs (doc_id % 5 = 0, the chain bases) with doc_id % 7 = 3: the tag
  * points 3 ids down, INTO a neighbouring redirect chain — so the walk
  * provably interleaves channels (canonical hop, then redirect hops) —
  * and DuckDB re-derives the identical graph, putting the full result in
  * the HARD oracle gate via the c42 recursive-CTE pattern.
  */
object CanonicalOps {

  /** Page-level canonical declarations: only redirect-terminal pages are
    * fetchable, and of those every 7th-residue-3 doc is a variant whose
    * canonical points 3 ids down.
    */
  private def canonicalEdges(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("src"),
        expr("CASE WHEN doc_id % 5 = 0 AND doc_id % 7 = 3 AND doc_id >= 3 " +
          "THEN doc_id - 3 END").as("dst"))
      .where(col("dst").isNotNull)

  /** c42's HTTP redirect graph, re-derived (same rule, shared testbed). */
  private def redirectEdges(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("src"),
        expr("CASE WHEN doc_id % 5 <> 0 THEN doc_id - 1 " +
          "WHEN (doc_id div 5) % 10 = 9 THEN doc_id + 4 ELSE NULL END").as("dst"))
      .where(col("dst").isNotNull)

  /** (doc_id, final_id, n_hops, exceeded, n_aliases): every doc resolved
    * through the combined alias graph, plus the consolidated group size.
    */
  def consolidate(spark: SparkSession, dir: String, maxHops: Int = 8): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
    val redir = redirectEdges(docs)
    // redirect wins: a redirecting URL never exposes its canonical tag
    val canon = canonicalEdges(docs)
      .join(redir.select(col("src")), Seq("src"), "left_anti")
    val combined = redir.unionByName(canon)
    val resolved = RedirectOps.resolveAgainst(docs, combined, maxHops)
    val w = Window.partitionBy("final_id")
    resolved
      .withColumn("n_aliases", count(lit(1)).over(w))
      .select(col("id").as("doc_id"), col("final_id"),
        col("n_hops"), col("exceeded"), col("n_aliases"))
      .orderBy("doc_id")
  }
}
