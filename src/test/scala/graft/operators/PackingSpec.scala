package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** t17 goldens: packing must equal a single-threaded mirror exactly and
  * tile each shard's token stream without gaps or overlaps.
  */
class PackingSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private val budget = 512

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def mirror(): Map[Long, (Long, Long, Long, Long, Long)] = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.groupBy(_._1 % 8).flatMap { case (shard, xs) =>
      val ordered = xs.map { case (id, t) =>
        (id, t.trim.split("\\s+").length.toLong, md5hex(s"pack1:$id"))
      }.sortBy(_._3)
      var cum = 0L
      ordered.map { case (id, n, _) =>
        cum += n
        val start = cum - n
        id -> (shard, n, start,
          math.floor(start / budget.toDouble).toLong,
          math.floor((cum - 1) / budget.toDouble).toLong)
      }
    }
  }

  test("t17 packing == single-threaded mirror exactly") {
    val got = TextOps.sequencePack(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == mirror())
  }

  test("each shard's token stream is tiled without gaps or overlaps") {
    val rows = TextOps.sequencePack(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (shard, xs) =>
      val sorted = xs.sortBy(_._3)
      var expect = 0L
      sorted.foreach { case (_, n, start) =>
        assert(start == expect, s"shard $shard: gap/overlap at $start (want $expect)")
        expect = start + n
      }
      assert(expect == xs.map(_._2).sum, s"shard $shard total mismatch")
    }
    // straddling actually occurs (a doc spanning two sequences) — the
    // chunk semantics are exercised, not vacuous
    val spans = TextOps.sequencePack(spark, dir).collect()
      .map(r => r.getLong(5) - r.getLong(4))
    assert(spans.exists(_ > 0L), "no document straddles a sequence boundary")
    assert(spans.exists(_ == 0L), "every document straddles — budget too small")
  }
}
