package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** t14 golden: the distributed unigram-LM perplexity filter must equal a
  * single-threaded mirror with identical arithmetic (Laplace smoothing,
  * natural log, 4 dp HALF_UP rounding), every planted gibberish doc must
  * be flagged, no real doc may be flagged, and the corpus action must
  * drop exactly the flagged set.
  */
class LmFilterSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Sequential mirror of TextOps.lmQualityReport. */
  private def mirror(): Map[Long, (Long, Double, Boolean)] = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def toks(t: String): Seq[String] = t.trim.toLowerCase.split("\\s+").toSeq
    val train = docs.map { case (id, t) => id -> toks(t) }
    val vocab = train.values.flatten.groupBy(identity)
      .map { case (k, v) => k -> v.size.toDouble }
    val t = vocab.values.sum
    val v = vocab.size.toDouble
    val gib = docs.keys.filter(_ % 25 == 0).map { id =>
      (id + 2000000L) -> (0 until 8).map(k => md5hex(s"g$k:$id"))
    }.toMap
    (train ++ gib).map { case (id, ts) =>
      val lps = ts.map(tok => math.log((vocab.getOrElse(tok, 0.0) + 1.0) / (t + v)))
      val nll = r4(-(lps.sum / lps.size))
      id -> (ts.size.toLong, nll, nll > 8.0)
    }
  }

  private def report(): Map[Long, (Long, Double, Boolean)] =
    TextOps.lmQualityReport(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap

  test("t14 report == single-threaded mirror exactly") {
    assert(report() == mirror())
  }

  test("all planted gibberish flagged; no real doc flagged") {
    val rep = report()
    val (plants, real) = rep.partition(_._1 >= 2000000L)
    assert(plants.nonEmpty, "no plants in report — vacuous")
    assert(plants.values.forall(_._3), "a gibberish plant escaped the filter")
    assert(real.values.forall(!_._3), "a real document was flagged")
    // the separation is wide, not marginal: min plant nll > max real nll + 2
    val minPlant = plants.values.map(_._2).min
    val maxReal = real.values.map(_._2).max
    assert(minPlant > maxReal + 2.0, s"weak separation: $minPlant vs $maxReal")
  }

  test("corpus action drops exactly the flagged set") {
    val flagged = report().filter(_._2._3).keySet
    val kept = TextOps.lmFilteredCorpus(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val all = report().keySet
    assert(kept == all -- flagged)
  }

  // ---- t14b: persisted / incremental vocab ---------------------------

  test("persisted per-epoch vocab partials merge to the full vocab exactly") {
    import org.apache.spark.sql.functions._
    val root = graft.SparkTestBase.tempDir("graft-lmvocab")
    val train = TextOps.lmTrainCorpus(spark, dir)
    TextOps.writeVocabEpoch(train.where(col("doc_id") % 2 === 0), root, 0)
    TextOps.writeVocabEpoch(train.where(col("doc_id") % 2 === 1), root, 1)
    val merged = TextOps.readVocab(spark, root, 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = TextOps.lmVocabOf(train).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == full)
  }

  test("scoring through the persisted store == one-shot report exactly") {
    import org.apache.spark.sql.functions._
    val root = graft.SparkTestBase.tempDir("graft-lmvocab2")
    val train = TextOps.lmTrainCorpus(spark, dir)
    TextOps.writeVocabEpoch(train.where(col("doc_id") % 2 === 0), root, 0)
    TextOps.writeVocabEpoch(train.where(col("doc_id") % 2 === 1), root, 1)
    val viaStore = TextOps.lmScoreAgainst(
      TextOps.readVocab(spark, root, 1), TextOps.lmScoredCorpus(spark, dir))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(viaStore == report(), "persisted-vocab scoring diverged from one-shot")
  }
}
