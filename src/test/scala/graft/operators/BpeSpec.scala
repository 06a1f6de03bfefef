package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** t20 goldens: the multi-round BPE trainer must equal a single-threaded
  * mirror exactly (same greedy left-to-right merge semantics, same
  * (cnt desc, pair asc) argmax tie-break), and the selected counts must
  * be non-increasing across rounds.
  */
class BpeSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private val rounds = 3

  private def corpus(): Seq[Array[String]] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect()
      .map(_.getString(0).trim.split("\\s+")).toSeq

  private def mergeOnce(t: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pend: Option[String] = None
    t.foreach { x =>
      pend match {
        case None => pend = Some(x)
        case Some(p) if p == l && x == r => out += s"$l $r"; pend = None
        case Some(p) => out += p; pend = Some(x)
      }
    }
    pend.foreach(out += _)
    out.toArray
  }

  private def mirror(): Seq[(Int, String, String, Long)] = {
    var docs = corpus()
    (1 to rounds).map { round =>
      val counts = docs.flatMap(t => t.sliding(2).filter(_.length == 2))
        .groupBy(p => (p(0), p(1))).view.mapValues(_.size.toLong).toMap
      val ((l, r), c) = counts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.head
      docs = docs.map(mergeOnce(_, l, r))
      (round, l, r, c)
    }
  }

  test("t20 multi-round trainer == single-threaded mirror exactly") {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val got = TextOps.bpeTrain(spark, base, rounds)
    assert(got == mirror())
  }

  test("selected merge counts are non-increasing across rounds") {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val counts = TextOps.bpeTrain(spark, base, rounds).map(_._4)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"counts increased across rounds: $counts")
    assert(counts.head > 1L, "top pair occurs once — fixture vacuous")
  }
}
