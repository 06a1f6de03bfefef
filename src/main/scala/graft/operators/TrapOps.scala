package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crawl-trap detection (c27) — the frontier hygiene step every
  * production crawler runs and nothing in §2 covered: hosts whose URL
  * space is effectively infinite (calendar loops `/cal/2026/01/cal/...`,
  * session-id / tracking-param explosions) must be detected from URL
  * SHAPE alone, before fetch budget is wasted, because the seen-filter
  * never converges on them (every generated URL is genuinely new).
  *
  * Scale shape: per-URL features are one narrow projection (split /
  * array_distinct / size — all codegen'd, no UDF), the host report is
  * one partial-agg'd groupBy(host) whose exchange carries ~hosts rows,
  * and the ACTION is a broadcast anti-join of the (tiny) suspect-host
  * list against the frontier. The 10^10-row frontier is never shuffled.
  *
  * URLs are synthesized deterministically from the documents table
  * (same derivation in the DuckDB oracle) with two planted trap shapes:
  * repeated-segment loops and multi-tracking-param session URLs.
  */
object TrapOps {

  /** Deterministic URL table: one clean URL per doc, plus a
    * looping-path URL for every 11th doc and a session-id URL for every
    * 13th — so trap hosts emerge from the same host catalog the clean
    * traffic uses (ratio matters, not presence).
    */
  def syntheticUrls(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"))
    val lastDigit = substring(col("source"), -1, 1)
    val base = docs.select(col("source").as("host"),
      concat(lit("http://"), col("source"), lit("/sec"),
        pmod(col("doc_id"), lit(7)), lit("/art-"), col("doc_id")).as("url"))
    // trap shapes are HOST-conditioned (odd-digit hosts run a calendar
    // loop, {2,6}-digit hosts leak session ids) so the report separates
    // trap hosts from clean ones — the verdict a uniform plant can't test
    val loops = docs
      .where(pmod(col("doc_id"), lit(5)) === 0 &&
        lastDigit.isin("1", "3", "5", "7", "9"))
      .select(col("source").as("host"),
        concat(lit("http://"), col("source"),
          lit("/cal/2026/01/cal/2026/01/cal/2026/01/p"), col("doc_id")).as("url"))
    val sessions = docs
      .where(pmod(col("doc_id"), lit(7)) === 0 && lastDigit.isin("2", "6"))
      .select(col("source").as("host"),
        concat(lit("http://"), col("source"), lit("/sec"),
          pmod(col("doc_id"), lit(7)), lit("/art-"), col("doc_id"),
          lit("?sid="), md5(concat(lit("s:"), col("doc_id"))),
          lit("&ref="), md5(concat(lit("r:"), col("doc_id")))).as("url"))
    base.unionByName(loops).unionByName(sessions)
  }

  /** Per-URL trap features over any (host, url) frame — shape-only, no
    * fetch needed: a path that revisits >= `loopSlack` segments is a
    * loop; >= `maxParams` query params is a session/tracking explosion.
    */
  def urlTrapFeatures(urls: DataFrame, loopSlack: Int = 4,
                      maxParams: Int = 2): DataFrame = {
    val pathQ = regexp_replace(col("url"), "^[a-z]+://[^/]+", "")
    val path = element_at(split(pathQ, "\\?"), 1)
    val query = when(size(split(pathQ, "\\?")) >= 2,
      element_at(split(pathQ, "\\?"), 2)).otherwise(lit(""))
    val segs = filter(split(path, "/"), x => x =!= "")
    urls.select(
      col("host"), col("url"),
      size(segs).cast("long").as("depth"),
      size(array_distinct(segs)).cast("long").as("n_uniq"),
      when(length(query) > 0, size(split(query, "&")))
        .otherwise(lit(0)).cast("long").as("n_params"))
      .withColumn("is_trap",
        (col("depth") - col("n_uniq") >= loopSlack) ||
          col("n_params") >= maxParams)
  }

  /** c27 — per-host trap report: URL counts, trap counts, trap ratio,
    * and the suspect verdict the frontier action keys on.
    */
  def trapHostReport(spark: SparkSession, dir: String,
                     suspectRatio: Double = 0.1): DataFrame =
    urlTrapFeatures(syntheticUrls(spark, dir))
      .groupBy("host")
      .agg(count(lit(1)).as("n_urls"),
        count(when(col("is_trap"), 1)).as("n_trap"))
      // unrounded on purpose: the count-derived IEEE division is
      // bit-identical across engines (q32 precedent) — rounding would
      // only ADD a half-up-vs-half-even tie hazard at k/2^m ratios
      .withColumn("trap_ratio",
        col("n_trap").cast("double") / col("n_urls").cast("double"))
      .withColumn("trap_suspect", col("trap_ratio") >= suspectRatio)
      .orderBy("host")

  /** The frontier ACTION: drop every URL on a suspect host. The suspect
    * list is host-catalog-sized, so the anti-join broadcasts and the
    * frontier side never shuffles.
    */
  def filterTrapHosts(frontier: DataFrame, report: DataFrame): DataFrame =
    frontier.join(
      broadcast(report.where(col("trap_suspect")).select("host")),
      Seq("host"), "left_anti")
}
