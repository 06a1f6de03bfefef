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

  /** Single-threaded mirror of the span-pair plan (anchors -> df-cap ->
    * join -> agg): returns (corpus, pair map) — shared by the pair and
    * clip goldens.
    */
  private def mirror(): (Array[(Long, String)], Map[(Long, Long), (Long, Int, Int, Int, Int)]) = {
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
    (corpus, want)
  }

  test("repeatedSpans == single-threaded mirror; every planted partial copy found") {
    val got = TextOps.repeatedSpans(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6)))
      .toMap
    val (corpus, want) = mirror()
    assert(got == want, s"distributed != mirror (got ${got.size}, want ${want.size})")
    // every planted (orig, orig+2000000) pair with a >=300-byte copy found
    corpus.filter(d => d._1 % 25 == 0 && d._1 < 2000000L && d._2.length >= 57)
      .foreach { case (id, _) =>
        assert(want.contains((id, id + 2000000L)), s"planted copy of $id not found")
      }
  }

  test("clipRepeatedSpans == single-threaded mirror; clips the copy, keeps the rest") {
    val corpusDf = TextOps.spanCorpus(spark, dir)
    val got = TextOps.clipRepeatedSpans(
        corpusDf, TextOps.repeatedSpanPairs(corpusDf))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val (corpus, pairs) = mirror()
    // mirror action: merge each clipped doc's (b_from, b_to) extents,
    // clip with the SAME kernel (TextKit.clipSpans)
    val extentsByDoc = pairs.toSeq
      .groupBy(_._1._2)
      .view.mapValues(_.map { case (_, (_, _, _, bf, bt)) => (bf, bt) }).toMap
    val want = corpus.map { case (id, text) =>
      id -> extentsByDoc.get(id).map(e => TextKit.clipSpans(text, e)).getOrElse(text)
    }.toMap
    assert(got == want, "distributed clip != mirror clip")
    // semantics on the planted partial copies: the copied 300-byte slice is
    // (almost entirely) removed from the copy doc while its fresh lead-in
    // and tail survive, and the SOURCE doc is untouched (doc_a keeps its copy)
    val byId = corpus.toMap
    // restrict to sources that are not themselves doc_b of another pair
    // (the base corpus contains exact duplicates — q12 — whose higher id
    // legitimately gets fully clipped against the lower)
    corpus.filter(d => d._1 % 25 == 0 && d._1 < 2000000L && d._2.length >= 300 &&
        !extentsByDoc.contains(d._1))
      .foreach { case (id, orig) =>
        val copyId = id + 2000000L
        assert(got(id) == orig, s"source doc $id was modified")
        val clipped = got(copyId)
        assert(clipped.length < byId(copyId).length, s"copy of $id not clipped")
        // winnowing covers the shared span to within w-1=7 bytes per side:
        // no 64-byte run of the copied slice can survive the clip
        val slice = orig.substring(0, 300)
        val survived = (0 to slice.length - 64)
          .exists(i => clipped.contains(slice.substring(i, i + 64)))
        assert(!survived, s"a 64-byte run of the copied slice survived in $copyId")
        assert(clipped.startsWith(s"entirely fresh lead-in for copy $id :: ".take(20)),
          s"lead-in of $copyId damaged")
      }
  }
}
