package graft.operators

import graft.SparkTestBase.spark
import graft.functions.{ImageKit, MediaKit}
import graft.sources.Gen
import org.scalatest.funsuite.AnyFunSuite

class MediaOpsSpec extends AnyFunSuite {
  import spark.implicits._

  test("frame sample == single-threaded mirror (phash, mean_lum, ts)") {
    val got = MediaOps.frameSample(Gen.media(spark, 20), everyNth = 4)
      .collect().map(f => (f.media_id, f.frame_idx) -> f).toMap
    val want = Gen.mediaLocal(20).filter(_.kind == "video").flatMap { m =>
      val (n, w, h) = MediaKit.videoHeader(m.bytes)
      (0 until n by 4).map { f =>
        val px = MediaKit.decodeFrame(m.bytes, f)
        (m.media_id, f) ->
          (ImageKit.phashOfPixels(px, w, h),
            math.rint(px.sum.toDouble / px.length * 1e4) / 1e4,
            f * 1000L / m.fps)
      }
    }.toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (ph, lum, ts)) =>
      val g = got(k)
      assert(g.phash == ph && g.mean_lum == lum && g.ts_ms == ts, s"mismatch at $k")
    }
    // sampling actually samples: 16 frames, every 4th -> 4 rows per video
    assert(got.keySet.groupBy(_._1).forall(_._2.size == 4))
  }

  test("audio windows == single-threaded mirror (rms, zcr); windows vary") {
    val got = MediaOps.audioWindows(Gen.media(spark, 20))
      .collect().map(a => (a.media_id, a.window_idx) -> (a.rms, a.zcr)).toMap
    val want = Gen.mediaLocal(20).filter(_.kind == "audio").flatMap { m =>
      val (rate, samples) = MediaKit.decodeAudio(m.bytes)
      (0 until (samples.length + rate - 1) / rate).map { wi =>
        val from = wi * rate
        val until = math.min(samples.length, from + rate)
        (m.media_id, wi) ->
          (math.rint(MediaKit.rms(samples, from, until) * 1e6) / 1e6,
            math.rint(MediaKit.zeroCrossingRate(samples, from, until) * 1e6) / 1e6)
      }
    }.toMap
    assert(got == want)
    // the envelope makes energy differ across windows (not flat noise)
    val byMedia = got.toSeq.groupBy(_._1._1)
    byMedia.foreach { case (id, ws) =>
      val rmss = ws.map(_._2._1)
      assert(rmss.max - rmss.min > 0.01, s"$id windows are flat: $rmss")
    }
  }

  test("cross-modal near-dup == all-pairs local mirror; planted frames found at hamming 0") {
    val media = Gen.mediaLocal(10).filter(_.kind == "video")
    val planted = media.flatMap { m =>
      val (_, w, h) = MediaKit.videoHeader(m.bytes)
      Seq(0, 8).map { f =>
        val px = MediaKit.decodeFrame(m.bytes, f)
        (s"known-${m.media_id}-f$f", ImageKit.phashOfPixels(px, w, h))
      }
    }
    val images = planted.toDF("image_id", "phash")
    val got = MediaOps.crossModalNearDup(
      MediaOps.frameSample(Gen.media(spark, 10), everyNth = 4), images, maxHamming = 6)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getInt(3))).toSet
    // local mirror: all (sampled frame) x (image) pairs within 6 bits
    val frames = media.flatMap { m =>
      val (n, w, h) = MediaKit.videoHeader(m.bytes)
      (0 until n by 4).map { f =>
        (m.media_id, f, ImageKit.phashOfPixels(MediaKit.decodeFrame(m.bytes, f), w, h))
      }
    }
    val want = (for {
      (mid, f, fp) <- frames
      (iid, ip) <- planted
      d = java.lang.Long.bitCount(fp ^ ip)
      if d <= 6 && d <= 3 // mirror only certain-recall pairs (see below)
    } yield (mid, f, iid, d)).toSet
    // block bucketing guarantees recall only for hamming<=3 (pigeonhole);
    // every such pair must be found, and every planted identical frame is
    assert(want.subsetOf(got), s"missing certain-recall pairs: ${want.diff(got)}")
    planted.foreach { case (iid, _) =>
      assert(got.exists(g => g._3 == iid && g._4 == 0), s"planted $iid not found at 0")
    }
    // and nothing reported is a false positive (verify is exact)
    got.foreach { case (mid, f, iid, d) =>
      val fp = frames.find(x => x._1 == mid && x._2 == f).get._3
      val ip = planted.find(_._1 == iid).get._2
      assert(java.lang.Long.bitCount(fp ^ ip) == d && d <= 6)
    }
  }

  test("media payload bytes never appear in the feature output schema") {
    val frameCols = MediaOps.frameSample(Gen.media(spark, 4)).toDF().columns.toSet
    val audioCols = MediaOps.audioWindows(Gen.media(spark, 4)).toDF().columns.toSet
    assert(!frameCols.contains("bytes") && !audioCols.contains("bytes"))
  }

  test("video container: header sane, frames in range, distinct across time") {
    val m = Gen.mediaLocal(2).head
    val (n, w, h) = MediaKit.videoHeader(m.bytes)
    assert(n == 16 && w == 32 && h == 24)
    val frames = (0 until n).map(MediaKit.decodeFrame(m.bytes, _))
    frames.foreach(px => assert(px.length == w * h && px.forall(v => v >= 0 && v <= 255)))
    // encodeVideo round-trip: frame f is exactly genPixels(seed, f, w, h),
    // so consecutive frames must differ (variant changes the content)
    assert(frames.sliding(2).forall { case Seq(a, b) => !a.sameElements(b) })
    // explicit round-trip through the container with a known seed
    val enc = MediaKit.encodeVideo(seed = 7L, nFrames = 3, w = 8, h = 6)
    (0 until 3).foreach { f =>
      assert(MediaKit.decodeFrame(enc, f).sameElements(
        ImageKit.genPixels(7L, f, 8, 6).map(_ & 0xff)))
    }
  }

  test("c43 scene changes: cuts == planted boundaries exactly; == lag mirror") {
    val n = 24
    val got = MediaOps.sceneChangeDemo(spark, n).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    // expected cuts: the planted boundary frames (excluding frame 0 — a
    // scene START is a cut only when it has a predecessor)
    val wantCuts = (0L until n.toLong).flatMap { i =>
      Gen.sceneBoundariesOf(i).filter(_ > 0).map(f => (s"scene-$i", f))
    }.toSet
    assert(got.map(t => (t._1, t._2)).toSet == wantCuts,
      "cut set != planted scene boundaries")
    // sequential mirror straight off the decoded frames: hamming of
    // consecutive phashes, threshold 10 — and within-shot deltas are 0
    (0L until n.toLong).foreach { i =>
      val m = Gen.sceneMediaOf(i)
      val (nf, w, h) = MediaKit.videoHeader(m.bytes)
      val hashes = (0 until nf).map(f =>
        ImageKit.phashOfPixels(MediaKit.decodeFrame(m.bytes, f), w, h))
      val mirror = (1 until nf).flatMap { f =>
        val d = java.lang.Long.bitCount(hashes(f) ^ hashes(f - 1))
        if (d > 10) Some((s"scene-$i", f, d)) else None
      }
      assert(got.filter(_._1 == s"scene-$i").sortBy(_._2).toList == mirror.toList,
        s"scene-$i diverged from the sequential mirror")
      val bounds = Gen.sceneBoundariesOf(i).toSet
      (1 until nf).foreach { f =>
        if (!bounds.contains(f))
          assert(hashes(f) == hashes(f - 1), s"within-shot delta at scene-$i frame $f")
      }
    }
  }
}
