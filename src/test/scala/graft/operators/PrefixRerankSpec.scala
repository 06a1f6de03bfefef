package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** emb12 goldens (two-stage prefix-dimension retrieval). Pinned: returned
  * scores are EXACT full-dim cosines (rerank never reports the coarse
  * score), measured recall@5 against the brute-force answer holds a 0.6
  * floor at the default 16-of-64-dim / 8x-overfetch operating point, and
  * in the candidate-complete limit (overfetch covering the corpus) the
  * operator degrades to exactly the brute-force top-k — the property that
  * separates a lossy CANDIDATE stage from a lossy SCORING stage (emb05's
  * ADC scores, by contrast, are approximate even candidate-complete).
  */
class PrefixRerankSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private val k = 5
  private val nQ = 8

  private def corpus(): Array[(Long, Array[Float])] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def bruteTopK(): Map[Long, Array[Long]] = {
    val all = corpus()
    all.filter(_._1 < nQ).map { case (qid, qv) =>
      qid -> all.filter(_._1 != qid)
        .map(e => (e._1, cos(e._2, qv)))
        .sortBy(e => (-e._2, e._1)).take(k).map(_._1)
    }.toMap
  }

  test("emb12 reranked scores are exact full-dim cosines") {
    val all = corpus().toMap
    val got = SimilarityOps.annPrefixRerankTopK(spark, dir, nQ, k).collect()
    assert(got.length == nQ * k)
    got.foreach { r =>
      val want = math.rint(cos(all(r.getLong(0)), all(r.getLong(1))) * 1e4) / 1e4
      assert(r.getDouble(2) == want,
        s"coarse score leaked into the output: $r (exact $want)")
    }
  }

  test("recall@5 >= 0.6 at the default prefix/overfetch operating point") {
    val want = bruteTopK()
    val got = SimilarityOps.annPrefixRerankTopK(spark, dir, nQ, k).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = want.map { case (qid, ids) =>
      ids.count(got.getOrElse(qid, Set.empty).contains)
    }.sum
    assert(hits >= (nQ * k * 0.6).toInt,
      s"recall ${hits.toDouble / (nQ * k)} below 0.6 floor")
  }

  test("candidate-complete limit degrades to exactly the brute-force top-k") {
    val want = bruteTopK().map { case (q, ids) => (q, ids.toSeq) }
    val got = SimilarityOps
      .annPrefixRerankTopK(spark, dir, nQ, k, prefixDims = 16, overfetch = 100)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(1)))
      .sortBy(t => (t._1, t._2))
      .groupBy(_._1).view.mapValues(_.map(_._3).toSeq).toMap
    assert(got == want)
  }
}
