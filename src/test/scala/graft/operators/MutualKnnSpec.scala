package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** emb16 mutual-kNN edges: distributed result == a local exact mirror over
  * the same deterministic sample (the DuckDB oracle re-checks at sf0.01;
  * this pins the kNN + mutuality algebra and the structural invariants).
  */
class MutualKnnSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private val modulus = 5
  private val k = 3

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("mutualKnn == local exact mirror on the sf0.001 sample") {
    val sample = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.lit(modulus)) === 0)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val knn = sample.map { case (a, va) =>
      a -> sample.toSeq.filter(_._1 != a)
        .map { case (b, vb) => (b, cosine(va, vb)) }
        .sortBy { case (b, c) => (-c, b) }.take(k).map(_._1).toSet
    }
    val expected = (for {
      (a, nas) <- knn.toSeq; b <- nas
      if a < b && knn(b).contains(a)
    } yield (a, b)).toSet
    val got = SimilarityOps.mutualKnn(spark, dir, modulus, k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "sample should contain at least one mutual pair")
  }

  test("structural invariants: canonical direction, bounded mutual degree") {
    val rows = SimilarityOps.mutualKnn(spark, dir, modulus, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.forall { case (a, b, _) => a < b })
    assert(rows.forall { case (a, b, _) => a % modulus == 0 && b % modulus == 0 })
    // each endpoint appears in at most k mutual edges (mutual ⊆ kNN)
    val deg = rows.flatMap { case (a, b, _) => Seq(a, b) }
      .groupBy(identity).map(_._2.length)
    assert(deg.forall(_ <= k))
    assert(rows.forall { case (_, _, c) => c >= -1.0001 && c <= 1.0001 })
  }
}
