package graft.functions

/** Deterministic synthetic media container — the STUB codec layer for the
  * multimodal operators (builder brief: the sandbox has no ffmpeg/audio
  * libs, so the DECODE step is a clearly-marked deterministic stand-in
  * while the Spark-side plumbing — schema, partitioning, one-pass
  * mapPartitions decode, bytes never shuffled — is real and tested).
  *
  * "GFV1" video container: [magic:int][n_frames:int][w:int][h:int] then
  * n_frames * (w*h) gray bytes (frame f's pixels = ImageKit.genPixels with
  * variant=f, so per-frame features are independently recomputable).
  * "GFA1" audio container: [magic:int][sample_rate:int][n_samples:int]
  * then n_samples 16-bit little-endian PCM samples from a splitmix64
  * stream (seeded per media_id) shaped by a slow deterministic envelope,
  * so windowed RMS/ZCR vary across windows but are bit-stable everywhere.
  *
  * In production these two parse functions are the ONLY thing ffmpeg
  * would replace; every operator above them is codec-agnostic.
  */
object MediaKit {

  final val VideoMagic = 0x47465631 // "GFV1"
  final val AudioMagic = 0x47464131 // "GFA1"

  // ---- video ----

  def encodeVideo(seed: Long, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + nFrames * w * h)
    bb.putInt(VideoMagic); bb.putInt(nFrames); bb.putInt(w); bb.putInt(h)
    var f = 0
    while (f < nFrames) {
      val px = ImageKit.genPixels(seed, f, w, h)
      var i = 0
      while (i < px.length) { bb.put((px(i) & 0xff).toByte); i += 1 }
      f += 1
    }
    bb.array()
  }

  /** Encode explicit per-frame pixel planes (c43 scene fixtures: the
    * caller controls which frames are identical and where cuts land).
    */
  def encodeVideoFromPixels(frames: Array[Array[Int]], w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + frames.length * w * h)
    bb.putInt(VideoMagic); bb.putInt(frames.length); bb.putInt(w); bb.putInt(h)
    frames.foreach { px =>
      var i = 0
      while (i < px.length) { bb.put((px(i) & 0xff).toByte); i += 1 }
    }
    bb.array()
  }

  /** (nFrames, w, h) from the container header. */
  def videoHeader(bytes: Array[Byte]): (Int, Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.getInt == VideoMagic, "not a GFV1 payload")
    (bb.getInt, bb.getInt, bb.getInt)
  }

  /** Decode ONE frame's gray pixels without materializing the others —
    * the random-access shape a real keyframe-seeking decoder provides.
    */
  def decodeFrame(bytes: Array[Byte], frameIdx: Int): Array[Int] = {
    val (n, w, h) = videoHeader(bytes)
    require(frameIdx >= 0 && frameIdx < n, s"frame $frameIdx out of $n")
    val off = 16 + frameIdx * w * h
    val px = new Array[Int](w * h)
    var i = 0
    while (i < px.length) { px(i) = bytes(off + i) & 0xff; i += 1 }
    px
  }

  // ---- audio ----

  def encodeAudio(seed: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + nSamples * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(AudioMagic); bb.putInt(sampleRate); bb.putInt(nSamples)
    var i = 0
    var state = ImageKit.mix64(seed)
    while (i < nSamples) {
      state = ImageKit.mix64(state + 0x9e3779b97f4a7c15L)
      // envelope: amplitude swells/fades over ~1.3 s periods so windowed
      // RMS differs across windows (pure noise would be flat)
      val env = 0.15 + 0.85 * math.abs(math.sin(i * math.Pi / (sampleRate * 1.3)))
      val sample = ((state >> 16).toShort * env).toShort
      bb.putShort(sample)
      i += 1
    }
    bb.array()
  }

  /** (sampleRate, samples) */
  def decodeAudio(bytes: Array[Byte]): (Int, Array[Short]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt == AudioMagic, "not a GFA1 payload")
    val rate = bb.getInt; val n = bb.getInt
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = bb.getShort; i += 1 }
    (rate, out)
  }

  /** Root-mean-square of a sample window, normalized to [0,1]. */
  def rms(samples: Array[Short], from: Int, until: Int): Double = {
    var acc = 0.0
    var i = from
    while (i < until) { val s = samples(i) / 32768.0; acc += s * s; i += 1 }
    math.sqrt(acc / math.max(1, until - from))
  }

  /** Zero-crossing rate of a sample window (fraction of adjacent pairs
    * changing sign) — the classic cheap voiced/unvoiced heuristic.
    */
  def zeroCrossingRate(samples: Array[Short], from: Int, until: Int): Double = {
    var n = 0
    var i = math.max(from + 1, 1)
    while (i < until) {
      if ((samples(i) >= 0) != (samples(i - 1) >= 0)) n += 1
      i += 1
    }
    n.toDouble / math.max(1, until - from - 1)
  }

  /** Wrap raw PCM samples in a GFA1 container (the re-encode half of the
    * codec stub — used to construct derived clips: trims, gain changes).
    */
  def encodeAudioFromSamples(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(AudioMagic); bb.putInt(sampleRate); bb.putInt(samples.length)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Per-frame dominant spectral bin (the "constellation" peak — Wang,
    * ISMIR'03): non-overlapping `win`-sample frames, naive DFT magnitude
    * over bins 1..kBins, argmax with a lower-bin tiebreak. Gain changes
    * scale all magnitudes uniformly, so the argmax is level-invariant —
    * the property copy detection needs.
    */
  def spectralPeaks(samples: Array[Short], win: Int = 256, kBins: Int = 32): Array[Int] = {
    val nFrames = samples.length / win
    val out = new Array[Int](nFrames)
    var f = 0
    while (f < nFrames) {
      val base = f * win
      var bestBin = 1
      var bestMag = -1.0
      var b = 1
      while (b <= kBins) {
        var re = 0.0; var im = 0.0
        var n = 0
        while (n < win) {
          val ang = -2.0 * math.Pi * b * n / win
          val s = samples(base + n).toDouble
          re += s * math.cos(ang); im += s * math.sin(ang)
          n += 1
        }
        val mag = re * re + im * im
        if (mag > bestMag) { bestMag = mag; bestBin = b }
        b += 1
      }
      out(f) = bestBin
      f += 1
    }
    out
  }

  /** Constellation hashes: each frame's peak paired with the next
    * `fanout` frames' peaks; hash encodes (f1, f2, dt) so a match implies
    * the same spectral TRAJECTORY, not just a shared bin. Returns
    * (hash, frame_idx) pairs.
    */
  def constellation(peaks: Array[Int], fanout: Int = 3): IndexedSeq[(Long, Int)] =
    for {
      t <- 0 until peaks.length
      d <- 1 to fanout
      if t + d < peaks.length
    } yield (peaks(t).toLong * 1000000L + peaks(t + d).toLong * 100L + d, t)
}
