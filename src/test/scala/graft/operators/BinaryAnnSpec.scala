package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** emb13 goldens (1-bit sign-quantized Hamming ANN). Pinned: the packed
  * sign words equal a bit-by-bit JVM mirror for every corpus vector (the
  * engine-parity contract the DuckDB oracle relies on), returned scores
  * are EXACT full-dim cosines (the Hamming score never leaks), measured
  * recall@5 against brute force holds a 0.6 floor at the default 12x
  * overfetch, and candidate-complete the operator degrades to exactly the
  * brute-force top-k (lossy candidate stage, exact scoring stage — the
  * emb12 separation).
  */
class BinaryAnnSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private val k = 5
  private val nQ = 3

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

  private def signWord(v: Array[Float], word: Int): Long = {
    var w = 0L
    var i = 0
    while (i < 32) {
      if (v(word * 32 + i).toDouble > 0.0) w |= (1L << i)
      i += 1
    }
    w
  }

  private def bruteTopK(): Map[Long, Seq[Long]] = {
    val all = corpus()
    all.filter(_._1 < nQ).map { case (qid, qv) =>
      qid -> all.filter(_._1 != qid)
        .map(e => (e._1, cos(e._2, qv)))
        .sortBy(e => (-e._2, e._1)).take(k).map(_._1).toSeq
    }.toMap
  }

  test("packed sign words == JVM bit mirror for every corpus vector") {
    import org.apache.spark.sql.functions.col
    val got = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        SimilarityOps.signWordCol(col("embedding"), 0).as("w0"),
        SimilarityOps.signWordCol(col("embedding"), 1).as("w1"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val all = corpus()
    assert(all.nonEmpty && got.size == all.length)
    all.foreach { case (id, v) =>
      assert(got(id) == ((signWord(v, 0), signWord(v, 1))),
        s"sign words diverge for vec $id")
    }
  }

  test("emb13 reranked scores are exact full-dim cosines") {
    val all = corpus().toMap
    val got = SimilarityOps.annBinaryTopK(spark, dir, nQ, k).collect()
    assert(got.length == nQ * k)
    got.foreach { r =>
      val want = math.rint(cos(all(r.getLong(0)), all(r.getLong(1))) * 1e4) / 1e4
      assert(r.getDouble(2) == want,
        s"Hamming score leaked into the output: $r (exact $want)")
    }
  }

  test("recall@5 >= 0.6 at the default 12x overfetch") {
    val want = bruteTopK()
    val got = SimilarityOps.annBinaryTopK(spark, dir, nQ, k).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = want.map { case (qid, ids) =>
      ids.count(got.getOrElse(qid, Set.empty).contains)
    }.sum
    assert(hits >= (nQ * k * 0.6).toInt,
      s"recall ${hits.toDouble / (nQ * k)} below 0.6 floor")
  }

  test("candidate-complete limit degrades to exactly the brute-force top-k") {
    val want = bruteTopK()
    val got = SimilarityOps.annBinaryTopK(spark, dir, nQ, k, overfetch = 200)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(1)))
      .sortBy(t => (t._1, t._2))
      .groupBy(_._1).view.mapValues(_.map(_._3).toSeq).toMap
    assert(got == want)
  }
}
