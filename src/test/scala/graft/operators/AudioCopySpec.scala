package graft.operators

import graft.SparkTestBase.spark
import graft.functions.MediaKit
import org.scalatest.funsuite.AnyFunSuite

/** c38 goldens: every planted copy (trim + gain + new tail) is detected
  * at the correct frame offset, no unrelated pair scores near the
  * threshold, and the result equals a single-threaded mirror of the same
  * kernels.
  */
class AudioCopySpec extends AnyFunSuite {
  private val n = 60
  private val minScore = 20L
  private val maxDf = 16

  private def mirror(): Map[(Long, Long), (Long, Long)] = {
    val fps = (0L until n.toLong).map { i =>
      val m = MediaOps.audioCopyRowOf(i)
      val (_, samples) = MediaKit.decodeAudio(m.bytes)
      i -> MediaKit.constellation(MediaKit.spectralPeaks(samples))
    }.toMap
    val hashOwners = scala.collection.mutable.Map.empty[Long, Set[Long]]
    fps.foreach { case (i, hs) =>
      hs.map(_._1).distinct.foreach { h =>
        hashOwners(h) = hashOwners.getOrElse(h, Set.empty) + i
      }
    }
    val rareHash = hashOwners.filter(_._2.size <= maxDf).keySet
    val out = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for (a <- 0L until n.toLong; b <- a + 1 until n.toLong) {
      val byHashB = fps(b).filter(p => rareHash(p._1)).groupBy(_._1)
      val votes = scala.collection.mutable.Map.empty[Long, Long]
      fps(a).filter(p => rareHash(p._1)).foreach { case (h, ta) =>
        byHashB.getOrElse(h, Seq.empty).foreach { case (_, tb) =>
          val off = (tb - ta).toLong
          votes(off) = votes.getOrElse(off, 0L) + 1L
        }
      }
      if (votes.nonEmpty) {
        val (off, sc) = votes.maxBy { case (o, s) => (s, -o) }
        if (sc >= minScore) out((a, b)) = (off, sc)
      }
    }
    out.toMap
  }

  test("c38 detection == single-threaded mirror exactly") {
    val got = MediaOps.audioCopyDetect(spark, n, minScore, maxDf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == mirror())
  }

  test("every planted copy detected at offset -2; nothing else detected") {
    val got = MediaOps.audioCopyDetect(spark, n, minScore, maxDf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val planted = (0L until n.toLong).filter(_ % 5 == 4).map(i => (i - 1, i))
    assert(planted.nonEmpty)
    planted.foreach { p =>
      assert(got.contains(p), s"planted copy $p not detected")
      // source trimmed 2 frames: copy's frame t matches source's t+2
      assert(got(p)._1 == -2L, s"wrong offset for $p: ${got(p)}")
      assert(got(p)._2 >= minScore)
    }
    assert(got.keySet == planted.toSet,
      s"false positives: ${got.keySet -- planted.toSet}")
  }

  test("incidental scores sit far below the threshold (margin >= 2x)") {
    val all = MediaOps.audioCopyDetect(spark, n, minScore = 1L, maxDf = maxDf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3)))
    val planted = (0L until n.toLong).filter(_ % 5 == 4).map(i => (i - 1, i)).toSet
    val incidental = all.filterNot(p => planted(p._1)).map(_._2)
    val copies = all.filter(p => planted(p._1)).map(_._2)
    assert(copies.min >= 2 * minScore, s"weak copy score: ${copies.min}")
    if (incidental.nonEmpty)
      assert(incidental.max < minScore / 2,
        s"incidental score too close to threshold: ${incidental.max}")
  }
}
