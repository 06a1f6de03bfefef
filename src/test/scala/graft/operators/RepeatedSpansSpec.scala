package graft.operators

import graft.SparkTestBase.spark
import graft.functions.TextKit
import org.scalatest.funsuite.AnyFunSuite

class RepeatedSpansSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("winnowing guarantee: a shared span >= k+w-1 always yields a common anchor hash") {
    // deterministic pseudo-texts with a planted verbatim span
    def noise(seed: Long, n: Int): String = {
      val sb = new StringBuilder
      var s = seed
      while (sb.length < n) {
        s = graft.functions.ImageKit.mix64(s)
        sb.append(('a' + java.lang.Long.remainderUnsigned(s, 26L)).toChar)
        if (sb.length % 7 == 0) sb.append(' ')
      }
      sb.toString
    }
    val span = noise(999L, 57) // exactly k + w - 1 at defaults (50 + 8 - 1)
    (1 to 20).foreach { i =>
      val a = noise(i * 2L, 150) + span + noise(i * 2L + 1, 150)
      val b = noise(i * 1000L, 200) + span + noise(i * 1000L + 1, 100)
      val ha = TextKit.winnowedWindows(a).map(_._2).toSet
      val hb = TextKit.winnowedWindows(b).map(_._2).toSet
      assert(ha.intersect(hb).nonEmpty, s"no shared anchor for planted span (case $i)")
    }
    // degenerate inputs are total
    assert(TextKit.winnowedWindows("").isEmpty)
    assert(TextKit.winnowedWindows("short").isEmpty)
    assert(TextKit.winnowedWindows(null).isEmpty)
  }

  test("repeatedSpans == single-threaded mirror; every planted partial copy found") {
    val got = TextOps.repeatedSpans(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6)))
      .toMap
    // local mirror of the exact plan (anchors -> df-cap -> join -> agg)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val corpus = docs ++ docs.filter(_._1 % 25 == 0).map { case (id, text) =>
      val slice = text.substring(0, math.min(300, text.length))
      (id + 2000000L, s"entirely fresh lead-in for copy $id :: " + slice +
        " :: and an unrelated tail section")
    }
    val anchors = corpus.flatMap { case (id, text) =>
      TextKit.winnowedWindows(text).map { case (off, h) => (h, id, off) }
    }
    val hot = anchors.groupBy(_._1).filter(_._2.map(_._2).distinct.size > 64).keySet
    val idx = anchors.filterNot(a => hot.contains(a._1))
    val byHash = idx.groupBy(_._1)
    val pairs = scala.collection.mutable.Map.empty[(Long, Long),
      (scala.collection.mutable.Set[Long], Array[Int], Array[Int])]
    byHash.values.foreach { as =>
      for (a <- as; b <- as if a._2 < b._2) {
        val e = pairs.getOrElseUpdate((a._2, b._2),
          (scala.collection.mutable.Set.empty[Long],
            Array(Int.MaxValue, Int.MinValue), Array(Int.MaxValue, Int.MinValue)))
        e._1 += a._1
        e._2(0) = math.min(e._2(0), a._3); e._2(1) = math.max(e._2(1), a._3)
        e._3(0) = math.min(e._3(0), b._3); e._3(1) = math.max(e._3(1), b._3)
      }
    }
    val want = pairs.collect { case (k, (hs, ae, be)) if hs.size >= 2 =>
      k -> (hs.size.toLong, ae(0), ae(1), be(0), be(1))
    }.toMap
    assert(got == want, s"distributed != mirror (got ${got.size}, want ${want.size})")
    // every planted (orig, orig+2000000) pair with a >=300-byte copy found
    docs.filter(d => d._1 % 25 == 0 && d._2.length >= 57).foreach { case (id, _) =>
      assert(got.contains((id, id + 2000000L)), s"planted copy of $id not found")
    }
  }
}
