package graft.operators

import graft.SparkTestBase.{spark, withShufflePartitions}
import org.scalatest.funsuite.AnyFunSuite

/** t23 goldens (the DuckDB oracle gates the parquet corpus; the SEMANTICS
  * — distinctive terms outrank ubiquitous ones, all-integer arithmetic —
  * are pinned here on a constructed corpus against a sequential mirror).
  */
class TfidfSpec extends AnyFunSuite {
  import spark.implicits._

  // 'common' appears in every doc (minimum idf); each doc also carries a
  // unique term and a mid-frequency one.
  private def corpus() = spark.createDataset(Seq(
    (1L, "common alpha alpha shared"),
    (2L, "common beta shared shared"),
    (3L, "common gamma Gamma COMMON"),
    (4L, "common delta  delta\tdelta"))).toDF("doc_id", "text")

  private def mirror(rows: Seq[(Long, String)], k: Int) = {
    val toks = rows.flatMap { case (id, t) =>
      t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).map(id -> _)
    }
    val tf = toks.groupBy(identity).map { case ((id, term), g) => (id, term, g.size.toLong) }
    val df = tf.groupBy(_._2).map { case (term, g) => term -> g.size.toLong }
    val n = rows.size.toLong
    val scored = tf.map { case (id, term, f) => (id, term, f, df(term), f * ((n * 1000000L) / df(term))) }
    scored.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.toSeq.sortBy(r => (-r._5, r._2)).take(k).zipWithIndex
        .map { case ((id, term, f, d, s), i) => (id, term, f, d, s, i + 1) }
    }.toSet
  }

  private def run(df: org.apache.spark.sql.DataFrame) =
    TextOps.tfidfTopTermsOf(df, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).toSet

  test("tfidf == sequential mirror (all-integer fixed-point)") {
    val rows = Seq(
      (1L, "common alpha alpha shared"),
      (2L, "common beta shared shared"),
      (3L, "common gamma Gamma COMMON"),
      (4L, "common delta  delta\tdelta"))
    assert(run(corpus()) == mirror(rows, 3))
  }

  test("a doc-unique term outranks the everywhere term") {
    val got = run(corpus())
    val rank1 = got.filter(_._6 == 1).map(t => t._1 -> t._2).toMap
    // doc 2: beta (tf 1, df 1) and shared (tf 2, df 2) tie at 4M — the
    // term-asc tie-break picks 'beta' deterministically
    assert(rank1 == Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma", 4L -> "delta"))
    // 'common' (df == n) carries the minimum idf: never rank 1
    assert(!got.exists(t => t._2 == "common" && t._6 == 1))
  }

  test("parallelism invariance") {
    val base = run(corpus())
    assert(withShufflePartitions(3)(run(corpus())) == base)
  }
}
