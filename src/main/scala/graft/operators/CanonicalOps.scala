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

  /** c100 — canonicalization RULE ATTRIBUTION: c01 reports THAT URLs
    * change under P1's canonicalizer; this reports WHY — per-rule fire
    * counts (fragment strip, host case-fold, default-port strip,
    * dot-segment removal, tracking-param removal, query reorder) over a
    * raw frontier, the observability table that tells an operator which
    * upstream emitters produce the mess (a spike in tracking-param
    * fires = a new feed wrapper; a spike in dot-segments = a broken
    * relative-link resolver). The classifier reads the RAW string with
    * pure column predicates — deliberately INDEPENDENT of the kernel —
    * and CanonicalSpec pins the attribution sound and complete against
    * `canon_url` on the frontier generator: every URL any rule flags
    * changes, every changed URL is flagged by some rule.
    *
    * Scale: one narrow map over the frontier + one map-side-combined
    * 8-counter agg; the stacked result is 8 rows.
    */
  def ruleAttribution(spark: SparkSession, n: Long = 4000): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val flagged = ruleFlags(graft.sources.Gen.seeds(spark, n).toDF())
    flagged.agg(
        count(lit(1)).as("total"),
        sum(when(col("changed"), 1L).otherwise(0L)).as("chg"),
        sum(when(col("r_fragment"), 1L).otherwise(0L)).as("f"),
        sum(when(col("r_host_case"), 1L).otherwise(0L)).as("hc"),
        sum(when(col("r_default_port"), 1L).otherwise(0L)).as("dp"),
        sum(when(col("r_dot_segments"), 1L).otherwise(0L)).as("ds"),
        sum(when(col("r_tracking"), 1L).otherwise(0L)).as("tr"),
        sum(when(col("r_param_order"), 1L).otherwise(0L)).as("po"))
      .select(expr("stack(8, 'total', total, 'changed', chg, " +
        "'fragment', f, 'host_case', hc, 'default_port', dp, " +
        "'dot_segments', ds, 'tracking_params', tr, 'param_order', po) " +
        "AS (rule, n_fired)"), col("total"))
      .select(col("rule"), col("n_fired"),
        expr("(10000 * n_fired) div total").as("share_bp"))
      .orderBy("rule")
  }

  /** The raw-string rule classifier + the kernel's verdict, per URL. */
  def ruleFlags(seeds: DataFrame): DataFrame = {
    val trackingRe =
      "(\\?|&)(utm_[^=&]*|gclid|fbclid|igshid|mc_cid|mc_eid|yclid|" +
        "msclkid|ref_src|ref|spm|_ga)="
    seeds
      .withColumn("canon", expr("canon_url(url)"))
      .withColumn("changed", col("canon") =!= col("url"))
      .withColumn("auth",
        regexp_extract(col("url"), "^[a-zA-Z]+://([^/#?]*)", 1))
      .withColumn("q", regexp_extract(col("url"), "\\?([^#]*)", 1))
      .withColumn("qp", filter(split(col("q"), "&"), p => p =!= ""))
      .withColumn("r_fragment", col("url").contains("#"))
      .withColumn("r_host_case", col("auth") =!= lower(col("auth")))
      .withColumn("r_default_port",
        col("url").rlike("^http://[^/?#]*:80([/?#]|$)")
          || col("url").rlike("^https://[^/?#]*:443([/?#]|$)"))
      .withColumn("r_dot_segments",
        col("url").rlike("/\\.\\.?(/|$)"))
      .withColumn("r_tracking", col("url").rlike(trackingRe))
      .withColumn("r_param_order",
        size(col("qp")) > 1 && !(col("qp") === array_sort(col("qp"))))
  }
}
