package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Deterministic image kernel: procedural pixel generation, png/jpeg
  * encode/decode via javax.imageio (stdlib — zero-egress sandbox), 64-bit
  * DCT perceptual hash, PSNR.
  *
  * Semantics source: BASELINE.json input_hint — per-row invariant
  * "decoded-pixel allclose (PSNR>=40dB for lossy) + caption equality";
  * north_rule "detects revised pages via phash/caption comparison".
  * (Reference tree empty in this sandbox; SURVEY.md §0.)
  *
  * Everything here is a pure function of its arguments: no wall clock, no
  * unseeded RNG, no locale. phash is the classic 32x32-DCT pHash: gray
  * resample to 32x32 -> 2D DCT-II -> 8x8 low-frequency block -> bit i = 1
  * iff coefficient > median (DC term excluded from the median).
  */
object ImageKit {
  // ImageIO must run headless in the sandbox.
  System.setProperty("java.awt.headless", "true")

  val PhashSize = 32
  val PhashBlock = 8

  /** Procedural grayscale pixels: smooth 2-D sinusoid field seeded by
    * (seed, variant). Smooth => jpeg survives >=40dB at q=0.95. `variant`
    * perturbs frequency/phase so revision scenarios get controllably
    * different pixels.
    */
  def genPixels(seed: Long, variant: Int, w: Int, h: Int): Array[Int] = {
    val m = mix64(seed + 0x9e3779b97f4a7c15L * (variant + 1))
    val fx = 1.0 + (m & 0x7) * 0.5
    val fy = 1.0 + ((m >>> 3) & 0x7) * 0.5
    val px = ((m >>> 6) & 0xff) / 40.0
    val py = ((m >>> 14) & 0xff) / 40.0
    val amp = 90.0 + ((m >>> 22) & 0x1f)
    // Broadband content matters: a pure low-freq sinusoid leaves most DCT
    // coefficients ~0, so their signs (the phash bits) flip under jpeg
    // noise. The diagonal + product octaves below give every 8x8 low-freq
    // coefficient a decisive magnitude -> phash is stable across png/jpeg.
    val fd = 2.0 + ((m >>> 27) & 0x7) * 0.7
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = 128.0 +
          amp * 0.40 * math.sin(fx * x * math.Pi / w + px) +
          amp * 0.28 * math.cos(fy * y * math.Pi / h + py) +
          amp * 0.20 * math.sin(fd * (x + y) * math.Pi / (w + h) + px * 0.5) +
          amp * 0.12 * math.sin((x * math.Pi / w + 0.6) * (y * math.Pi / h + 0.6) * 3.1 + py)
        out(y * w + x) = math.max(0, math.min(255, math.round(v).toInt))
        x += 1
      }
      y += 1
    }
    out
  }

  def toImage(pixels: Array[Int], w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixels(y * w + x)); x += 1 }
      y += 1
    }
    img
  }

  /** Encode gray pixels as png (lossless) or jpeg (quality 0.95). */
  def encode(pixels: Array[Int], w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = toImage(pixels, w, h)
    val bos = new ByteArrayOutputStream()
    fmt match {
      case "png" => ImageIO.write(img, "png", bos)
      case "jpeg" =>
        val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(0.95f)
        val ios = new MemoryCacheImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), param)
        ios.flush(); writer.dispose()
      case other => throw new IllegalArgumentException(s"fmt=$other")
    }
    bos.toByteArray
  }

  /** Decode to gray pixel array + dims. Any color model is re-rendered onto
    * TYPE_BYTE_GRAY so the gray conversion is a single fixed JVM path.
    */
  def decodeGray(bytes: Array[Byte]): (Array[Int], Int, Int) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) return (Array.emptyIntArray, 0, 0)
    val w = img.getWidth; val h = img.getHeight
    val gray =
      if (img.getType == BufferedImage.TYPE_BYTE_GRAY) img
      else {
        val g = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val gr = g.createGraphics()
        gr.drawImage(img, 0, 0, null); gr.dispose()
        g
      }
    val raster = gray.getRaster
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (out, w, h)
  }

  def psnr(a: Array[Int], b: Array[Int]): Double = {
    require(a.length == b.length && a.nonEmpty, "pixel arrays must align")
    var se = 0.0
    var i = 0
    while (i < a.length) { val d = (a(i) - b(i)).toDouble; se += d * d; i += 1 }
    val mse = se / a.length
    if (mse == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  /** 64-bit perceptual hash of encoded image bytes. Total: bad bytes -> 0L. */
  def phash64(bytes: Array[Byte]): Long = {
    if (bytes == null || bytes.isEmpty) return 0L
    val (px, w, h) = decodeGray(bytes)
    if (w == 0 || h == 0) return 0L
    phashOfPixels(px, w, h)
  }

  def phashOfPixels(px: Array[Int], w: Int, h: Int): Long = {
    val small = resampleArea(px, w, h, PhashSize, PhashSize)
    val dct = dct2d(small, PhashSize)
    // 8x8 low-frequency block, row-major bit order u*8+v; median over the
    // 63 non-DC coefficients.
    val coefs = new Array[Double](PhashBlock * PhashBlock)
    var u = 0
    while (u < PhashBlock) {
      var v = 0
      while (v < PhashBlock) { coefs(u * PhashBlock + v) = dct(u * PhashSize + v); v += 1 }
      u += 1
    }
    val sorted = coefs.drop(1).sorted
    val median = (sorted(30) + sorted(31)) / 2.0 // 63 values -> mid pair
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (i != 0 && coefs(i) > median) bits |= (1L << (63 - i))
      i += 1
    }
    bits
  }

  /** Area-average resample (pure, deterministic; no Graphics2D scaling). */
  def resampleArea(px: Array[Int], w: Int, h: Int, tw: Int, th: Int): Array[Double] = {
    val out = new Array[Double](tw * th)
    var ty = 0
    while (ty < th) {
      val y0 = ty * h / th
      val y1 = math.max(y0 + 1, (ty + 1) * h / th)
      var tx = 0
      while (tx < tw) {
        val x0 = tx * w / tw
        val x1 = math.max(x0 + 1, (tx + 1) * w / tw)
        var sum = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += px(y * w + x); x += 1 }
          y += 1
        }
        out(ty * tw + tx) = sum / ((y1 - y0) * (x1 - x0))
        tx += 1
      }
      ty += 1
    }
    out
  }

  // Precomputed DCT-II basis for N=32 (separable 2-D transform).
  private val cosTable: Array[Double] = {
    val n = PhashSize
    val t = new Array[Double](n * n)
    var k = 0
    while (k < n) {
      var x = 0
      while (x < n) { t(k * n + x) = math.cos((2 * x + 1) * k * math.Pi / (2.0 * n)); x += 1 }
      k += 1
    }
    t
  }

  def dct2d(in: Array[Double], n: Int): Array[Double] = {
    val tmp = new Array[Double](n * n)
    // rows
    var y = 0
    while (y < n) {
      var u = 0
      while (u < n) {
        var s = 0.0
        var x = 0
        while (x < n) { s += in(y * n + x) * cosTable(u * n + x); x += 1 }
        tmp(y * n + u) = s
        u += 1
      }
      y += 1
    }
    // cols
    val out = new Array[Double](n * n)
    var u2 = 0
    while (u2 < n) {
      var v = 0
      while (v < n) {
        var s = 0.0
        var y2 = 0
        while (y2 < n) { s += tmp(y2 * n + v) * cosTable(u2 * n + y2); y2 += 1 }
        out(u2 * n + v) = s
        v += 1
      }
      u2 += 1
    }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Horizontal mirror of a row-major pixel array (pure). */
  def flipHorizontal(px: Array[Int], w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](px.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = px(y * w + (w - 1 - x)); x += 1 }
      y += 1
    }
    out
  }

  /** phash of the horizontally MIRRORED image. Total like [[phash64]]. */
  def phashFlip64(bytes: Array[Byte]): Long = {
    if (bytes == null || bytes.isEmpty) return 0L
    val (px, w, h) = decodeGray(bytes)
    if (w == 0 || h == 0) return 0L
    phashOfPixels(flipHorizontal(px, w, h), w, h)
  }

  /** Flip-INVARIANT canonical phash: the unsigned-min of the two
    * orientations' hashes. An image and its mirror canonicalize to the
    * SAME value (the pair {phash(I), phash(flip I)} is orientation-
    * independent), so whole-hash dedup over this column catches mirrored
    * copies that plain phash is blind to (the DCT's odd horizontal
    * coefficients negate under mirroring, flipping ~half the sign bits).
    */
  def canonPhash64(bytes: Array[Byte]): Long = {
    val a = phash64(bytes)
    val b = phashFlip64(bytes)
    if (java.lang.Long.compareUnsigned(a, b) <= 0) a else b
  }

  /** splitmix64 finalizer — the deterministic mixer used across the engine. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Variance of the 4-neighbor Laplacian over interior pixels, in integer
    * fixed point (x100, floor DIV) — the standard no-reference blur/focus
    * measure (variance-of-Laplacian, Pech-Pacheco et al. ICPR'00): blur
    * attenuates high frequencies, collapsing the Laplacian's spread.
    * All-integer (sum / sum-of-squares over int Laplacians), so the score
    * is bit-identical at any parallelism and between the distributed
    * operator and its mirror. Returns 0 for images with no interior.
    */
  def lapVarQ100(px: Array[Int], w: Int, h: Int): Long = {
    if (w < 3 || h < 3) return 0L
    var sum = 0L; var sumSq = 0L
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val i = y * w + x
        val lap = 4 * px(i) - px(i - 1) - px(i + 1) - px(i - w) - px(i + w)
        sum += lap; sumSq += lap.toLong * lap
        x += 1
      }
      y += 1
    }
    val n = (w - 2).toLong * (h - 2)
    // var = E[l^2] - E[l]^2, scaled x100 with integer floor division
    (sumSq * 100L) / n - (sum * sum * 100L) / (n * n)
  }

  /** 3x3 box blur with edge clamp (integer mean, floor DIV) — the
    * deterministic low-pass used to plant blurred twins in tests/demos.
    */
  def boxBlur3(px: Array[Int], w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](px.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var s = 0; var n = 0
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            val yy = y + dy; val xx = x + dx
            if (yy >= 0 && yy < h && xx >= 0 && xx < w) {
              s += px(yy * w + xx); n += 1
            }
            dx += 1
          }
          dy += 1
        }
        out(y * w + x) = s / n
        x += 1
      }
      y += 1
    }
    out
  }
}
