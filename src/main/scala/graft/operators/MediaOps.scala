package graft.operators

import graft.functions.{ImageKit, MediaKit}
import graft.model.{AudioWindow, FrameFeature, MediaRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

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

  /** c43 — video SCENE-CHANGE detection (shot segmentation, the classic
    * hash-delta method — e.g. Zhang/Kankanhalli/Smoliar, Multimedia
    * Systems '93 pairwise-difference shot detection, here on perceptual
    * hashes): a cut is a consecutive-frame pair whose phash Hamming
    * distance exceeds `tau`; frames inside a shot track each other (the
    * fixture makes them identical), a cut jumps ~half the hash bits. The
    * downstream uses are the crawl's video semantics: one representative
    * frame per SHOT (instead of every-Nth blind sampling) for the
    * cross-modal screen (c15), and shot counts as video metadata.
    *
    * Plan shape: runs on the frame FEATURE table (media_id, frame_idx,
    * phash — 20 bytes/frame; the decoded pixels never leave frameSample's
    * partition), one window shuffle on media_id, bit_count/lag codegen
    * builtins — no UDF.
    */
  def sceneChanges(frames: Dataset[FrameFeature], tau: Int = 10): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    frames.toDF()
      .select("media_id", "frame_idx", "phash")
      .withColumn("prev", lag("phash", 1).over(w))
      .where(col("prev").isNotNull)
      .withColumn("hamming",
        bit_count(col("phash").bitwiseXOR(col("prev"))).cast("int"))
      .where(col("hamming") > tau)
      .select(col("media_id"), col("frame_idx").as("cut_frame"), col("hamming"))
  }

  /** c43 demo: every frame of the scene fixtures (everyNth=1 — shot
    * detection needs adjacent pairs), cuts at tau=10.
    */
  def sceneChangeDemo(spark: SparkSession, n: Int = 40): org.apache.spark.sql.DataFrame =
    sceneChanges(frameSample(graft.sources.Gen.sceneMedia(spark, n), everyNth = 1))
      .orderBy("media_id", "cut_frame")

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

  // ---- c38: audio copy detection (constellation fingerprints) ---------
  //
  // Shazam-style landmark matching (Wang, ISMIR'03): per clip, frame-wise
  // dominant spectral bins pair into (f1, f2, dt) hashes; two clips match
  // when many shared hashes agree on ONE time offset. The offset vote is
  // what separates a real copy from incidental hash collisions.
  //
  // Scale shape: fingerprinting is a per-row flatMap (bytes never
  // shuffle; ids + 8-byte hashes out); candidates come from an
  // equi-join on the hash (the inverted-index discipline of t05/c17,
  // df-capped the same way); the offset vote is one map-side-combined
  // groupBy. Robust by construction to gain changes (argmax peaks) and
  // frame-aligned trims (offset vote absorbs the shift); sub-frame
  // shifts need overlapping hops — the same plan with hop < win.

  /** One audio clip per id; every 5th clip (i%5==4) is a PLANTED COPY of
    * clip i-1: first 2 frames (512 samples) trimmed, gain scaled to 0.8,
    * 512 fresh noise samples appended — trim + gain + different tail.
    */
  def audioCopyRowOf(i: Long, rate: Int = 8000, seconds: Int = 2): MediaRow = {
    def freshSeed(j: Long) = ImageKit.mix64(0xAD10_C0DEL + j * 7919L)
    val n = rate * seconds
    if (i % 5 == 4) {
      val (r, src) = MediaKit.decodeAudio(
        MediaKit.encodeAudio(freshSeed(i - 1), rate, n))
      val trimmed = src.drop(512).map(s => (s * 0.8).toShort)
      var state = ImageKit.mix64(freshSeed(i) + 17L)
      val tail = Array.fill(512) {
        state = ImageKit.mix64(state + 0x9e3779b97f4a7c15L)
        (state >> 16).toShort
      }
      MediaRow(s"aud-$i", "audio",
        MediaKit.encodeAudioFromSamples(r, trimmed ++ tail),
        duration_ms = seconds * 1000L, fps = 0, sample_rate = r, n_frames = n)
    } else {
      MediaRow(s"aud-$i", "audio", MediaKit.encodeAudio(freshSeed(i), rate, n),
        duration_ms = seconds * 1000L, fps = 0, sample_rate = rate, n_frames = n)
    }
  }

  def audioCopyCorpus(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n.toLong, 1L, math.max(1, math.min(8, n / 8)))
      .mapPartitions(_.map(i => audioCopyRowOf(i.longValue)))
  }

  /** (media_idx, hash, t) fingerprint table — per-row flatMap, bytes
    * never leave the scan.
    */
  def audioFingerprints(clips: Dataset[MediaRow]): DataFrame = {
    import clips.sparkSession.implicits._
    clips.filter(_.kind == "audio").flatMap { m =>
      val idx = m.media_id.stripPrefix("aud-").toLong
      val (_, samples) = MediaKit.decodeAudio(m.bytes)
      MediaKit.constellation(MediaKit.spectralPeaks(samples))
        .map { case (h, t) => (idx, h, t) }
    }.toDF("media_idx", "hash", "t")
  }

  /** c38 — detected copies: (media_a, media_b, offset, score) where
    * score = matching hashes at the best single offset; `minScore` sits
    * far above the incidental-collision band (asserted in AudioCopySpec).
    */
  def audioCopyDetect(spark: SparkSession, n: Int = 60,
                      minScore: Long = 20L, maxDf: Int = 16): DataFrame = {
    val fp = audioFingerprints(audioCopyCorpus(spark, n))
    // df-cap: a hash shared by many clips is a stop-landmark — joining it
    // costs df^2 pairs and carries no alignment information
    val rare = fp.join(
      fp.groupBy("hash").agg(countDistinct(col("media_idx")).as("df"))
        .where(col("df") <= maxDf).select("hash"),
      Seq("hash"), "left_semi")
    val votes = rare.as("a").join(rare.as("b"),
        col("a.hash") === col("b.hash") &&
          col("a.media_idx") < col("b.media_idx"))
      .groupBy(col("a.media_idx").as("media_a"),
        col("b.media_idx").as("media_b"),
        (col("b.t") - col("a.t")).as("offset"))
      .agg(count(lit(1)).as("score"))
    // deterministic best offset: lexicographic max over (score, -offset)
    // = highest score, smallest offset on ties
    val best = votes.groupBy("media_a", "media_b")
      .agg(max(struct(col("score"), (-col("offset")).as("noff"))).as("m"))
      .select(col("media_a"), col("media_b"),
        (-col("m.noff")).cast("long").as("offset"), col("m.score").as("score"))
    best.where(col("score") >= minScore)
      .orderBy("media_a", "media_b")
  }
}
