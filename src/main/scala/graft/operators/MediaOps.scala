package graft.operators

import graft.functions.{ImageKit, MediaKit}
import graft.model.{AudioWindow, FrameFeature, MediaRow}
import org.apache.spark.sql.Dataset

/** Multimodal operators over opaque media payloads (builder brief:
  * image/audio/video as opaque binary columns with typed metadata;
  * frame-sample / feature-extract as first-class ops). The codec layer is
  * the deterministic MediaKit stub — see its scaladoc — everything here is
  * codec-agnostic and is the part that survives swapping in ffmpeg.
  *
  * Scale discipline (the ImageOps pattern): payload bytes are decoded in
  * ONE executor-local mapPartitions pass and reduced to scalar features in
  * the same pass — `bytes` never crosses a shuffle, is never collected,
  * and the emitted rows are fixed-width scalars. Sampling (every Nth
  * frame) happens BEFORE decode via the container's random-access header,
  * so cost is proportional to frames kept, not frames stored — at 100 TB
  * the difference between touching 1/8th of the corpus bytes and all of
  * them.
  */
object MediaOps {

  /** Sample every `everyNth` frame of each video; per kept frame emit
    * (phash, mean luminance) — the join key surface for cross-modal dedupe
    * (a frame phash is directly comparable to the image table's phash).
    */
  def frameSample(media: Dataset[MediaRow], everyNth: Int = 4): Dataset[FrameFeature] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { m =>
        val (nFrames, w, h) = MediaKit.videoHeader(m.bytes)
        (0 until nFrames by everyNth).iterator.map { f =>
          val px = MediaKit.decodeFrame(m.bytes, f)
          var sum = 0L
          var i = 0
          while (i < px.length) { sum += px(i); i += 1 }
          FrameFeature(
            media_id = m.media_id,
            frame_idx = f,
            ts_ms = f * 1000L / math.max(1, m.fps),
            phash = ImageKit.phashOfPixels(px, w, h),
            mean_lum = math.rint(sum.toDouble / px.length * 1e4) / 1e4)
        }
      }
    }
  }

  /** Cross-modal near-dup: sampled video frames whose perceptual hash is
    * within `maxHamming` bits of any image-table phash — the "this video
    * contains our image" screen, joining the two modalities on the shared
    * 64-bit phash space. Blocking is the simhash pattern (TextOps): 4
    * rotated 16-bit blocks of the phash as candidate keys (pigeonhole:
    * Hamming<=3 guarantees a shared block; 4 blocks is the standard
    * recall/cost point), so the exchange carries (ids, phash) only and the
    * exact bit_count verify runs on the candidate set.
    */
  def crossModalNearDup(
      frames: Dataset[FrameFeature],
      images: org.apache.spark.sql.DataFrame, // (image_id, phash)
      maxHamming: Int = 6): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    def blocks(df: org.apache.spark.sql.DataFrame) = df.select(
      df.columns.toIndexedSeq.map(col) :+
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("blk"),
            shiftrightunsigned(col("phash"), b * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*))
          .as("block"): _*)
      .select(df.columns.toIndexedSeq.map(col) :+ col("block.blk").as("blk") :+ col("block.key").as("key"): _*)
    val f = blocks(frames.toDF().select(col("media_id"), col("frame_idx"), col("phash")))
      .withColumnRenamed("phash", "frame_phash")
    val i = blocks(images.select(col("image_id"), col("phash")))
      .withColumnRenamed("phash", "image_phash")
    f.join(i, Seq("blk", "key"))
      .select(col("media_id"), col("frame_idx"), col("image_id"),
        bit_count(col("frame_phash").bitwiseXOR(col("image_phash"))).as("hamming"))
      .dropDuplicates("media_id", "frame_idx", "image_id")
      .where(col("hamming") <= maxHamming)
  }

  /** 1-second tumbling-window audio features: RMS energy + zero-crossing
    * rate per window (the cheap silence/voicing screen a training-data
    * pipeline runs before expensive transcription).
    */
  def audioWindows(media: Dataset[MediaRow]): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.flatMap { m =>
        val (rate, samples) = MediaKit.decodeAudio(m.bytes)
        val nWindows = (samples.length + rate - 1) / rate
        (0 until nWindows).iterator.map { wi =>
          val from = wi * rate
          val until = math.min(samples.length, from + rate)
          AudioWindow(
            media_id = m.media_id,
            window_idx = wi,
            rms = math.rint(MediaKit.rms(samples, from, until) * 1e6) / 1e6,
            zcr = math.rint(MediaKit.zeroCrossingRate(samples, from, until) * 1e6) / 1e6)
        }
      }
    }
  }
}
