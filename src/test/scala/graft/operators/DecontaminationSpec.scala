package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** t13 benchmark decontamination: the distributed n-gram-overlap report
  * and the corpus action must reproduce a single-threaded mirror of the
  * same semantics exactly, and the planted leakage (benchmark rows in
  * the corpus + 20-token quoting docs) must all be flagged.
  */
class DecontaminationSpec extends AnyFunSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val N = 8

  private lazy val baseDocs: Seq[(Long, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq.sortBy(_._1)

  /** mirror of TextOps.leakedCorpus */
  private lazy val corpusLocal: Seq[(Long, String)] = {
    val quotes = baseDocs.filter(_._1 % 23 == 0).map { case (id, text) =>
      val toks = text.trim.split("\\s+").take(20)
      (id + 2000000L,
        toks.mkString(" ") +
          " then entirely novel commentary continues past the quotation")
    }
    baseDocs ++ quotes
  }

  private def ngramsLocal(text: String): Set[String] =
    text.trim.split("\\s+").sliding(N).filter(_.length == N)
      .map(_.mkString(" ")).toSet

  /** mirror of contaminationReport: per-doc count of n-grams shared with
    * the benchmark slice
    */
  private lazy val reportLocal: Seq[(Long, Long)] = {
    val benchNg = baseDocs.filter(_._1 % 23 == 0)
      .flatMap(d => ngramsLocal(d._2)).toSet
    corpusLocal
      .map { case (id, text) => id -> ngramsLocal(text).count(benchNg).toLong }
      .filter(_._2 > 0)
      .sortBy(_._1)
  }

  test("contamination report == single-threaded mirror (exact)") {
    val got = TextOps.contaminationReport(spark, dir, N)
      .as[(Long, Long)].collect().toSeq
    assert(got == reportLocal, "distributed report != mirror")
    // the planted leakage must all be caught: every benchmark doc (in
    // the corpus verbatim) and every 20-token quote doc is flagged
    val flagged = got.map(_._1).toSet
    val benchIds = baseDocs.map(_._1).filter(_ % 23 == 0)
    assert(benchIds.nonEmpty && benchIds.forall(flagged),
      "a benchmark doc present verbatim in the corpus escaped the report")
    assert(benchIds.forall(id => flagged(id + 2000000L)),
      "a quoting doc escaped the report")
    // a doc quoting k >= N tokens shares exactly k-N+1 n-grams with its
    // source (when the quote stops before the source ends); spot-check
    // the full-20-token quotes
    val byId = got.toMap
    benchIds.filter(id => baseDocs.find(_._1 == id).get._2.trim.split("\\s+").length > 20)
      .foreach { id => assert(byId(id + 2000000L) == 13L, s"quote of $id: hit count") }
  }

  test("decontaminated corpus drops exactly the flagged docs") {
    val kept = TextOps.decontaminatedCorpus(spark, dir, N)
      .select("doc_id").as[Long].collect().toSet
    val flagged = reportLocal.map(_._1).toSet
    val expected = corpusLocal.map(_._1).toSet -- flagged
    assert(kept == expected, "corpus action kept/dropped the wrong docs")
    assert(flagged.forall(!kept(_)), "a contaminated doc survived")
  }
}
