package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** emb11 goldens (predicate-filtered similarity search). Pinned: pre-filter
  * results == a single-threaded exact mirror; every returned row satisfies
  * the predicate and every query returns exactly k of them; and the
  * PRE-vs-POST contrast — post-filtering the unfiltered top-k loses rows
  * the pre-filter form returns (the reason the engine implements
  * pre-filter, and the reason production vector stores document the
  * difference).
  */
class FilteredAnnSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private val k = 5

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

  test("emb11 == exact pre-filter mirror; k in-predicate rows per query") {
    val all = corpus()
    val queries = all.filter(_._1 < 3)
    val want = queries.flatMap { case (qid, qv) =>
      all.filter(e => e._1 != qid && e._1 % 3 == 0)
        .map(e => (e._1, cos(e._2, qv)))
        .sortBy(e => (-e._2, e._1)).take(k).zipWithIndex
        .map { case ((vid, c), i) =>
          (qid, vid, math.rint(c * 1e4) / 1e4, (i + 1).toLong)
        }
    }.toSet
    val got = SimilarityOps.filteredCosineTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(got == want)
    got.foreach { case (_, vid, _, _) =>
      assert(vid % 3 == 0, s"out-of-predicate row $vid returned")
    }
    assert(got.groupBy(_._1).forall(_._2.size == k),
      "a query returned fewer than k in-predicate neighbors")
  }

  test("contrast: post-filtering the unfiltered top-k loses neighbors") {
    val pre = SimilarityOps.filteredCosineTopK(spark, dir).collect()
    val post = SimilarityOps.postFilteredTopK(spark, dir).collect()
    assert(post.length < pre.length,
      s"post-filter kept ${post.length} of ${pre.length} — contrast vacuous " +
        "(the unfiltered neighborhoods happen to satisfy the predicate)")
    // and the survivors post-filter DOES keep are a subset of pre-filter's
    // ids per query (same geometry, fewer candidates)
    val preIds = pre.map(r => (r.getLong(0), r.getLong(1))).toSet
    post.foreach { r =>
      assert(preIds.contains((r.getLong(0), r.getLong(1))),
        s"post-filter returned a pair pre-filter missed: $r")
    }
  }
}
