package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** t19 goldens: the scrub must equal a single-threaded Java-regex mirror
  * exactly, redact every planted PII token, and leave the natural corpus
  * byte-identical (zero false positives).
  */
class PiiScrubSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private val email = TextOps.EmailRe.r
  private val ip = TextOps.Ipv4Re.r

  private def mirror(): Map[Long, (Long, Long, String)] = {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val planted = base.filter(_._1 % 10 == 0).map { case (id, t) =>
      (id + 3000000L, s"$t contact user$id@example.com or 10.0.${id % 256}.7 now")
    }
    (base ++ planted).map { case (id, t) =>
      val scrubbed = ip.replaceAllIn(email.replaceAllIn(t, "<EMAIL>"), "<IP>")
      id -> (email.findAllIn(t).size.toLong, ip.findAllIn(t).size.toLong, scrubbed)
    }.toMap
  }

  test("t19 scrub == single-threaded mirror exactly") {
    val got = TextOps.piiScrub(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got == mirror())
  }

  test("planted PII fully redacted; natural corpus untouched") {
    val rows = TextOps.piiScrub(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val (planted, natural) = rows.partition(_._1 >= 3000000L)
    assert(planted.nonEmpty, "no PII planted — fixture vacuous")
    planted.foreach { case (id, ne, ni, t) =>
      assert(ne == 1L && ni == 1L, s"doc $id: expected 1 email + 1 ip")
      assert(t.contains("<EMAIL>") && t.contains("<IP>"), s"doc $id not redacted")
      assert(!t.contains("@"), s"doc $id leaked an email")
    }
    assert(natural.forall(r => r._2 == 0L && r._3 == 0L),
      "false-positive PII match in the natural corpus")
  }

  test("scrub plans with zero exchanges (pure per-row map)") {
    val plan = TextOps.piiScrub(spark, dir)
      .queryExecution.executedPlan.toString
    // the orderBy adds a final sort exchange; the scrub itself must not
    val noSort = TextOps.piiCorpus(spark, dir).select(
      org.apache.spark.sql.functions.regexp_replace(
        org.apache.spark.sql.functions.col("text"), TextOps.EmailRe, "<EMAIL>"))
      .queryExecution.executedPlan.toString
    assert(!noSort.contains("Exchange"), s"unexpected shuffle in t19 scrub:\n$noSort")
    assert(plan.nonEmpty)
  }
}
