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

  // ---- c31: incremental / streaming rule mining -----------------------

  /** One epoch of DUST observations appended to the persisted store
    * (the SeenStore/SimIndex discipline): the batch's parameterized and
    * bare URLs land under `dust_param/epoch=N` / `dust_bare/epoch=N`,
    * and the epoch's PAIR DELTA is computed with the standard
    * incremental-join identity
    *
    *   pairs(all) = pairs(old)  ∪  newParam x allBare  ∪  oldParam x newBare
    *
    * so an alias observed long after its bare counterpart (or before it —
    * streams deliver in any order) still pairs exactly once. Only the
    * per-(host, param) COUNT partials persist under `dust_pairs/epoch=N`;
    * counts are mergeable, so rule evaluation never re-joins history.
    */
  def writeDustEpoch(log: DataFrame, root: String, epoch: Int): Unit = {
    val spark = log.sparkSession
    val base = element_at(split(col("url"), "\\?"), 1)
    val param = regexp_extract(col("url"), "\\?([a-z]+)=", 1)
    val newParam = log.where(col("url").contains("?"))
      .select(col("host"), base.as("base_url"), param.as("param"),
        col("content_hash"))
    val newBare = log.where(!col("url").contains("?"))
      .select(col("host"), col("url").as("base_url"),
        col("content_hash").as("bare_hash"))
    newParam.write.mode("overwrite").parquet(s"$root/dust_param/epoch=$epoch")
    newBare.write.mode("overwrite").parquet(s"$root/dust_bare/epoch=$epoch")
    val allBare = spark.read.parquet(
      (0 to epoch).map(e => s"$root/dust_bare/epoch=$e"): _*)
    val oldParam =
      if (epoch == 0) newParam.limit(0)
      else spark.read.parquet(
        (0 until epoch).map(e => s"$root/dust_param/epoch=$e"): _*)
    newParam.join(allBare, Seq("host", "base_url"))
      .unionByName(newBare.join(oldParam, Seq("host", "base_url"))
        .select(col("host"), col("base_url"), col("param"),
          col("content_hash"), col("bare_hash")))
      .groupBy("host", "param")
      .agg(count(lit(1)).as("n_pairs"),
        count(when(col("content_hash") === col("bare_hash"), 1)).as("n_same"))
      .write.mode("overwrite").parquet(s"$root/dust_pairs/epoch=$epoch")
  }

  /** Rules from the persisted pair partials through `uptoEpoch` — one
    * sum per (host, param), identical verdict arithmetic to
    * [[aliasRules]] (the incremental==batch golden pins equality).
    */
  def dustRulesFrom(spark: SparkSession, root: String, uptoEpoch: Int,
                    minSupport: Int = 2): DataFrame =
    spark.read.parquet((0 to uptoEpoch).map(e => s"$root/dust_pairs/epoch=$e"): _*)
      .groupBy("host", "param")
      .agg(sum(col("n_pairs")).as("n_pairs"), sum(col("n_same")).as("n_same"))
      .withColumn("n_diff", col("n_pairs") - col("n_same"))
      .withColumn("irrelevant",
        col("n_same") >= minSupport && col("n_diff") === 0)
      .orderBy("host", "param")

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
