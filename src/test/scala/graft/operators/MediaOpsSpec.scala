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
}
