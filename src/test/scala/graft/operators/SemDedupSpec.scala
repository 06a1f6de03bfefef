package graft.operators

import graft.SparkTestBase.{spark, withShufflePartitions}
import org.scalatest.funsuite.AnyFunSuite

/** emb09 SemDeDup goldens. The fixture separates concerns from rounding:
  * duplicate groups are IDENTICAL vectors (cos == 1 up to an ulp) and all
  * other pairs are exactly orthogonal one-hot vectors (cos == 0), so no
  * decision can sit near the 0.99 threshold and the sequential mirror can
  * compare on the unrounded cosine.
  */
class SemDedupSpec extends AnyFunSuite {
  import spark.implicits._

  private val D = 64

  private def oneHot(dims: Int*): Seq[Float] =
    (0 until D).map(d => if (dims.contains(d)) 1.0f else 0.0f)

  // 3 planted duplicate groups (identical vectors => identical k-means
  // assignment by construction) + 40 pairwise-orthogonal singletons.
  private def corpus(): org.apache.spark.sql.DataFrame = {
    val g1 = Seq(0L, 10L, 20L).map(id => (id, oneHot(40, 41)))
    val g2 = Seq(1L, 11L).map(id => (id, oneHot(42, 43)))
    val g3 = Seq(2L, 12L, 22L, 32L).map(id => (id, oneHot(44, 45, 46)))
    val far = (100L until 140L).map(id => (id, oneHot(id.toInt - 100)))
    spark.createDataset(g1 ++ g2 ++ g3 ++ far).toDF("vec_id", "embedding")
  }

  /** Sequential mirror: same deterministic training (ivfTrain is pure in
    * its input), local VecKit assignment, brute within-cluster pairs on
    * the unrounded cosine, union-find components.
    */
  private def mirror(df: org.apache.spark.sql.DataFrame,
                     threshold: Double, k: Int): Set[(Long, Long, Boolean)] = {
    val cents = SimilarityOps.ivfTrain(df, k)
    val arr = cents.map(_.toArray).toArray
    val norms = arr.map(graft.functions.VecKit.norm)
    val rows = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val assign = rows.map { case (id, v) =>
      id -> graft.functions.VecKit.ivfAssign(v, arr, norms)
    }.toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val pairs = for {
      (ia, va) <- rows; (ib, vb) <- rows
      if ia < ib && assign(ia) == assign(ib) && cos(va, vb) >= threshold
    } yield (ia, ib)
    // union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    nodes.map(id => { val c = find(id); (id, c, id == c) }).toSet
  }

  private def run(df: org.apache.spark.sql.DataFrame, k: Int) =
    SimilarityOps.semDedupOf(df, 0.99, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

  test("semDedup == sequential mirror (same training, union-find)") {
    val df = corpus()
    val got = run(df, 16)
    val want = mirror(df, 0.99, 16)
    assert(want.nonEmpty, "vacuous fixture: mirror found no components")
    assert(got == want)
  }

  test("duplicate groups merge to the min id; singletons never appear") {
    val got = run(corpus(), 16)
    val byId = got.map(t => t._1 -> t._2).toMap
    assert(Seq(0L, 10L, 20L).forall(byId(_) == 0L))
    assert(Seq(1L, 11L).forall(byId(_) == 1L))
    assert(Seq(2L, 12L, 22L, 32L).forall(byId(_) == 2L))
    assert(got.count(_._3) == 3, "exactly one survivor per group")
    assert(!got.exists(_._1 >= 100L), "an orthogonal singleton was paired")
  }

  test("corpus action keeps survivors + singletons, drops the rest") {
    val df = corpus()
    val kept = SimilarityOps.semDedupedCorpus(df, 0.99, 16)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val want = Set(0L, 1L, 2L) ++ (100L until 140L)
    assert(kept == want)
  }

  test("parallelism invariance") {
    val base = run(corpus(), 16)
    val narrow = withShufflePartitions(3)(run(corpus(), 16))
    assert(narrow == base)
  }
}
