package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** emb14 goldens (maximum-inner-product search). Pinned: the exact
  * operator equals a single-threaded double-fold mirror bit-for-bit
  * after the 4 dp rounding; the Bachrach RecSys'14 norm-augmentation
  * reduction at FULL probe radius reproduces the exact answer (the
  * augmented-cosine order == dot order law, end-to-end through the
  * bucket machinery); and the default multi-probe setting clears the
  * ANN family's 0.6 recall floor.
  */
class MipsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val vecs: Map[Long, Array[Float]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val id = r.getLong(0)
        val w = 1.0 + (id % 7) * 0.1
        id -> r.getSeq[Float](1).map(x => (x.toDouble * w).toFloat).toArray
      }.toMap

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private def mirror(nQueries: Int, k: Int): Set[(Long, Long, Double, Long)] =
    (0L until nQueries.toLong).flatMap { q =>
      vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, dot(v, vecs(q))) }
        .sortBy { case (id, d) => (-d, id) }
        .take(k).zipWithIndex
        .map { case ((id, d), i) => (q, id, r4(d), i + 1L) }
    }.toSet

  test("emb14 exact MIPS == single-threaded mirror") {
    val got = SimilarityOps.bruteMipsTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(got == mirror(3, 5))
  }

  test("norm-augmented reduction at full probe radius == exact MIPS") {
    val exact = SimilarityOps.bruteMipsTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val full = SimilarityOps.annMipsLsh(spark, dir, probeRadius = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(full == exact,
      "full-probe augmented-LSH MIPS must reproduce the exact ranking")
  }

  test("emb14 ANN (default probes) recall vs exact MIPS >= 0.6") {
    val exact = SimilarityOps.bruteMipsTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = SimilarityOps.annMipsLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ann).size.toDouble / exact.size
    assert(recall >= 0.6, f"MIPS ANN recall $recall%.3f fell below 0.6")
  }

  test("MIPS is not cosine: magnitude plant makes the rankings differ") {
    // the reduction is only non-trivial when corpus norms VARY — pin that
    // the augmented tail sqrt(M^2-|x|^2) is live, and that the dot
    // ranking actually disagrees with the cosine ranking somewhere
    val norms = vecs.values.map(v => math.sqrt(dot(v, v))).toSeq
    assert(norms.max - norms.min > 0.1,
      "MIPS corpus has constant norms; MIPS degenerates to cosine")
    val mips = SimilarityOps.bruteMipsTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cos = (0L until 3L).flatMap { q =>
      vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          (id, dot(v, vecs(q)) / (math.sqrt(dot(v, v)) * math.sqrt(dot(vecs(q), vecs(q))))) }
        .sortBy { case (id, d) => (-d, id) }.take(5).map(p => (q, p._1))
    }.toSet
    assert(mips != cos,
      "dot and cosine top-k agree everywhere; the magnitude plant is dead")
  }
}
