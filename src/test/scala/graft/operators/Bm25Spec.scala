package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** t34 goldens (BM25 ranked retrieval, Robertson-ratio idf in t23's
  * integer fixed point). Pinned: the full operator output — in-plan
  * df-rank query derivation included — equals a single-threaded mirror
  * that recomputes tokenize/tf/dl/df/query-terms/score/top-k with plain
  * Scala collections and the identical integer arithmetic; the scoring
  * law is sane (same length + same df, strictly higher tf => never a
  * lower fixed-point term score); and the output rows carry exactly
  * k=5 ranks per realized query with deterministic tie-breaks.
  */
class Bm25Spec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  /** Identical fixed-point term score to the operator / oracle. */
  private def termScore(tf: Long, df: Long, dl: Long,
                        nDocs: Long, sumDl: Long): Long =
    ((2 * (nDocs - df) + 1) * 1000 / (2 * df + 1)) *
      ((22 * tf * sumDl * 1000) /
        (10 * tf * sumDl + 3 * sumDl + 9 * dl * nDocs))

  private def mirror(k: Int): Seq[(Long, Long, Long, Long, Int)] = {
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val toks = corpus.flatMap { case (id, text) =>
      text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).map(id -> _)
    }
    val tf = toks.groupBy(identity).map { case ((id, t), v) =>
      (id, t, v.length.toLong)
    }.toSeq
    val dl = tf.groupBy(_._1).map { case (id, v) => id -> v.map(_._3).sum }
    val dfT = tf.groupBy(_._2).map { case (t, v) => t -> v.size.toLong }
    val nDocs = dl.size.toLong
    val sumDl = dl.values.sum
    val ranked = dfT.toSeq.sortBy { case (t, df) => (-df, t) }
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1) }.toMap
    // .toSeq first: collect on the Map would rebuild a Map keyed by the
    // query id and collapse each query to one term
    val qterms =
      ranked.toSeq.collect { case (t, r) if Set(10, 20, 30)(r) => (1L, t) } ++
        ranked.toSeq.collect { case (t, r) if Set(15, 25, 35)(r) => (2L, t) }
    val perDoc = (for {
      (qid, qt) <- qterms.toSeq
      (id, t, f) <- tf if t == qt
    } yield ((qid, id), termScore(f, dfT(t), dl(id), nDocs, sumDl)))
      .groupBy(_._1)
      .map { case ((qid, id), v) =>
        (qid, id, v.map(_._2).sum, v.size.toLong)
      }.toSeq
    perDoc.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy { case (_, id, score, _) => (-score, id) }
        .take(k).zipWithIndex
        .map { case ((qid, id, score, nt), i) => (qid, id, score, nt, i + 1) }
    }.sortBy(r => (r._1, r._5))
  }

  test("t34 top-k == single-threaded mirror exactly (queries derived in-plan)") {
    val got = TextOps.bm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
      .toSeq.sortBy(r => (r._1, r._5))
    val want = mirror(5)
    assert(got == want)
    assert(got.map(_._1).distinct.sorted == Seq(1L, 2L))
    assert(got.count(_._1 == 1L) == 5 && got.count(_._1 == 2L) == 5)
  }

  test("scoring law: higher tf never scores lower at equal df/dl") {
    for (df <- Seq(1L, 10L, 100L); dl <- Seq(10L, 100L); tf <- 1L to 20L) {
      val lo = termScore(tf, df, dl, 500L, 27939L)
      val hi = termScore(tf + 1, df, dl, 500L, 27939L)
      assert(hi >= lo, s"tf=$tf df=$df dl=$dl")
    }
  }
}
