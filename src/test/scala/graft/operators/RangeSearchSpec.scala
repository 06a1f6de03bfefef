package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** emb15 goldens (cosine range search — radius retrieval). Pinned: the
  * distributed operator equals a single-threaded mirror exactly after
  * the 4 dp rounding; every query's planted strong twin (tiny dim-0
  * nudge) lands INSIDE the tau=0.9 neighborhood and every weak twin
  * (unit dim-1 shove) lands OUTSIDE it while still being a genuine
  * near-miss (cos > 0.3) — so the threshold provably separates and the
  * plant is live on both sides.
  */
class RangeSearchSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private val tau = 0.9

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val base: Map[Long, Array[Float]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def twin(v: Array[Float], dim: Int, delta: Double): Array[Float] = {
    val out = v.clone()
    out(dim) = (out(dim).toDouble + delta).toFloat
    out
  }

  private lazy val corpus: Map[Long, Array[Float]] =
    base ++
      base.filter(_._1 < 3).map { case (id, v) => (id + 1000000L) -> twin(v, 0, 0.05) } ++
      base.filter(_._1 < 3).map { case (id, v) => (id + 2000000L) -> twin(v, 1, 1.0) }

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val mirror: Set[(Long, Long, Double)] =
    (0L until 3L).flatMap { q =>
      corpus.toSeq.filter(_._1 != q)
        .map { case (id, v) => (q, id, r4(cos(v, base(q)))) }
        .filter(_._3 >= tau)
    }.toSet

  test("emb15 range search == single-threaded mirror") {
    val got = SimilarityOps.rangeSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == mirror)
  }

  test("threshold separates: strong twins in, weak twins out (and live)") {
    val got = SimilarityOps.rangeSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 3L).foreach { q =>
      assert(got.contains((q, q + 1000000L)),
        s"query $q's strong twin fell outside the tau neighborhood")
      assert(!got.contains((q, q + 2000000L)),
        s"query $q's weak twin leaked inside the tau neighborhood")
      val weakCos = cos(corpus(q + 2000000L), base(q))
      assert(weakCos < tau && weakCos > 0.3,
        f"weak twin cos $weakCos%.3f is not a near-miss; the plant is dead")
    }
  }
}
