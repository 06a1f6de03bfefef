package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** DUST — Different URLs with Similar Text (c28; Bar-Yossef et al.,
  * WWW'07 "Do not crawl in the DUST"): mine URL-ALIAS rules from the
  * (url, content-hash) pairs a crawl has already fetched, then rewrite
  * the frontier so known aliases collapse BEFORE the seen-filter.
  *
  * Why the frontier needs it: canonicalization (P1) strips the
  * tracking params everyone knows about; DUST learns the SITE-SPECIFIC
  * ones (session ids, print flags, mirror prefixes) from evidence. A
  * session-id param that survives canonicalization multiplies one
  * article into thousands of "new" URLs — the seen-filter correctly
  * calls each genuinely new, so only a learned rewrite rule stops the
  * waste (same budget-hygiene family as c27's trap detection, but
  * driven by fetched CONTENT, not URL shape).
  *
  * Rule model (the high-yield slice of the paper's rule grammar): a
  * query parameter p is content-irrelevant on host h if every observed
  * (url-with-p, url-without-p) pair on h carries identical content and
  * there are at least `minSupport` such agreeing pairs; one observed
  * disagreement kills the rule (the paper's "large support, zero
  * refutation" regime).
  *
  * Scale shape: the alias-pair join keys on (host, base_url) and both
  * sides carry (host, base, content-digest) only — never bytes; the
  * mined rule table is ~(hosts x params), broadcastable for the
  * frontier action, so the 10^10-row frontier is rewritten without a
  * shuffle. URL synthesis is deterministic from the documents table
  * (c27 discipline) so the report is DuckDB-oracled end to end.
  */
object DustOps {

  /** Deterministic fetched-URL log: one clean URL per doc plus three
    * planted alias shapes — `sid` and `ref` params that do NOT change
    * content (true DUST: every 3rd / 5th doc), and a `v` param that DOES
    * (every 4th doc, offset 1) so the miner must separate them.
    */
  def syntheticUrlLog(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"))
    val baseUrl = concat(lit("http://"), col("source"), lit("/item"),
      pmod(col("doc_id"), lit(7)), lit("/a"), col("doc_id"))
    val sameContent = md5(concat(lit("c:"), col("doc_id")))
    val clean = docs.select(col("source").as("host"), baseUrl.as("url"),
      sameContent.as("content_hash"))
    val sid = docs.where(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("source").as("host"),
        concat(baseUrl, lit("?sid="), md5(concat(lit("x:"), col("doc_id")))).as("url"),
        sameContent.as("content_hash"))
    val ref = docs.where(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("source").as("host"),
        concat(baseUrl, lit("?ref="), md5(concat(lit("y:"), col("doc_id")))).as("url"),
        sameContent.as("content_hash"))
    val v2 = docs.where(pmod(col("doc_id"), lit(4)) === 1)
      .select(col("source").as("host"),
        concat(baseUrl, lit("?v=2")).as("url"),
        md5(concat(lit("d:"), col("doc_id"))).as("content_hash"))
    clean.unionByName(sid).unionByName(ref).unionByName(v2)
  }

  /** Mine per-(host, param) alias rules from any (host, url,
    * content_hash) log. Pairs = parameterized URLs equi-joined to their
    * param-less base on (host, base_url); a rule needs `minSupport`
    * agreeing pairs and zero disagreeing ones.
    */
  def aliasRules(urlLog: DataFrame, minSupport: Int = 2): DataFrame = {
    val base = element_at(split(col("url"), "\\?"), 1)
    val param = regexp_extract(col("url"), "\\?([a-z]+)=", 1)
    val withParam = urlLog.where(col("url").contains("?"))
      .select(col("host"), base.as("base_url"), param.as("param"),
        col("content_hash"))
    val bare = urlLog.where(!col("url").contains("?"))
      .select(col("host"), col("url").as("base_url"),
        col("content_hash").as("bare_hash"))
    withParam.join(bare, Seq("host", "base_url"))
      .groupBy("host", "param")
      .agg(count(lit(1)).as("n_pairs"),
        count(when(col("content_hash") === col("bare_hash"), 1)).as("n_same"))
      .withColumn("n_diff", col("n_pairs") - col("n_same"))
      .withColumn("irrelevant",
        col("n_same") >= minSupport && col("n_diff") === 0)
      .orderBy("host", "param")
  }

  /** c28 — the driver-facing report over the synthetic log. */
  def dustReport(spark: SparkSession, dir: String,
                 minSupport: Int = 2): DataFrame =
    aliasRules(syntheticUrlLog(spark, dir), minSupport)

  /** The frontier ACTION: strip params that a learned rule marks
    * content-irrelevant on their host. The rule table broadcasts; the
    * frontier never shuffles — untouched URLs pass through unchanged.
    */
  def rewriteFrontier(frontier: DataFrame, rules: DataFrame): DataFrame = {
    val irr = rules.where(col("irrelevant"))
      .select(col("host"), col("param"), lit(true).as("strip"))
    frontier
      .withColumn("param", regexp_extract(col("url"), "\\?([a-z]+)=", 1))
      .join(broadcast(irr), Seq("host", "param"), "left")
      .select(col("host"),
        when(col("strip"), element_at(split(col("url"), "\\?"), 1))
          .otherwise(col("url")).as("url"))
  }
}
