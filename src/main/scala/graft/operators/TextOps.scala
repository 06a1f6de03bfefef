package graft.operators

import graft.functions.{GraftFunctions, TextKit}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data text operators over the `documents` table (builder brief:
  * dedup / language-ID / quality / fingerprinting as first-class engine
  * components).
  */
object TextOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** SQL-checkable slice of quality scoring: char/token/punct stats. */
  def qualityStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_act"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
      round(
        length(regexp_replace(col("text"), "[^.!?,;:]", "")).cast("double") /
          greatest(length(col("text")), lit(1)), 4).as("punct_ratio"))

  /** Full text profile: heuristic language-ID, quality score, simhash +
    * rolling-hash fingerprints, BPE-ish token count (custom codegen'd
    * expressions — rows-only gate + scalatest).
    */
  def textProfile(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    docs(spark, dir).select(
      col("doc_id"),
      col("lang"),
      GraftFunctions.langId(col("text")).as("lang_pred"),
      round(GraftFunctions.qualityScore(col("text")), 4).as("quality"),
      GraftFunctions.simhash64(col("text")).as("simhash"),
      GraftFunctions.rollingFingerprint(col("text")).as("fingerprint"),
      GraftFunctions.bpeTokenCount(col("text")).as("n_bpe_tokens"))
  }

  /** MinHash+LSH near-duplicate detection (shingle -> minhash -> band ->
    * bucket-join -> exact-Jaccard verify), the canonical large-corpus
    * near-dup plan:
    *
    *   1. band keys per doc via one codegen'd expression (no UDF);
    *   2. posexplode -> shuffle is (doc_id, band) pairs only — text stays
    *      out of the self-join (at 100 TB the candidate join must carry
    *      ids, never payloads);
    *   3. candidate pairs = equi-join on (band_idx, band_key), a<b;
    *   4. exact verify joins text back by id for the (small) candidate set.
    *
    * A deterministic 5% of docs is planted as near-dup copies so the
    * operator provably fires on the test corpus.
    */
  def nearDupMinhash(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val base = docs(spark, dir).select("doc_id", "text")
    val planted = base.where(pmod(col("doc_id"), lit(20)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" appended revision marker tokens")).as("text"))
    val corpus = base.unionByName(planted)
    val banded = corpus
      .select(col("doc_id"),
        posexplode(GraftFunctions.minhashBands(col("text"))).as(Seq("band_idx", "band_key")))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val jaccard = udf((a: String, b: String) => TextKit.jaccardShingles(a, b))
    candidates
      .join(corpus.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("text", "text_a"), "doc_a")
      .join(corpus.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("text", "text_b"), "doc_b")
      .withColumn("jaccard", round(jaccard(col("text_a"), col("text_b")), 4))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** SimHash near-dup: fingerprint once, candidate pairs by identical
    * 16-bit prefix block (cheap bucketing), verify by Hamming distance.
    */
  def nearDupSimhash(spark: SparkSession, dir: String, maxHamming: Int = 6): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val base = docs(spark, dir).select("doc_id", "text")
    val planted = base.where(pmod(col("doc_id"), lit(20)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" appended revision marker tokens")).as("text"))
    val sh = base.unionByName(planted)
      .select(col("doc_id"), GraftFunctions.simhash64(col("text")).as("simhash"))
    // 4 rotated 16-bit blocks: docs within Hamming<=6 of a 64-bit hash agree
    // on at least one block w.h.p. (pigeonhole gives >=1 exact block for
    // Hamming<=3; 4 blocks is the standard recall/cost point).
    val blocked = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("blk"),
          shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*))
        .as("block"))
      .select(col("doc_id"), col("simhash"),
        col("block.blk").as("blk"), col("block.key").as("key"))
    blocked.as("a").join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .where(col("hamming") <= maxHamming)
  }
}
