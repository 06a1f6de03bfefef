package graft.operators

import graft.functions.ImageKit
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** c76 — image-caption ALIGNMENT gate (the LAION/DataComp curation
  * primitive: score every (image, caption) pair with a two-tower encoder
  * cosine and keep pairs above a threshold — the single filter that turned
  * Common Crawl's alt-text soup into the big image-text training sets).
  *
  * ENCODER STUBS, per the builder brief: no neural encoder exists in this
  * container, so both towers are deterministic fakes — the "visual tower"
  * is a real decode + 8x8 area-resample + mean-centering (a genuine, if
  * shallow, featurizer), and the "text tower" parses the synthetic
  * caption vocabulary back into the same 64-d space (grid-cell tokens
  * reconstruct mid-bin cell values; any other token hashes into a
  * pseudo-random low-amplitude dim, so arbitrary text still embeds).
  * Swapping in real CLIP towers changes ONLY the two kernel functions;
  * every Spark-side decision is the production one.
  *
  * Scale shape (100 TB): alignment is a PER-ROW verdict — image bytes and
  * caption live in the same row, so the whole gate is ONE mapPartitions
  * pass with ZERO exchanges (asserted in the spec): decode once, embed
  * both towers, cosine, compare. Bytes never shuffle, never collect; the
  * output is ids + a double + a boolean. At 10^10 pairs this runs at scan
  * speed and partitions embarrassingly.
  */
object AlignOps {

  val Dim = 64 // 8x8 grid cells
  private val Grid = 8

  /** Visual tower stub: decode -> 8x8 area means -> center. Total on
    * garbage (zero vector).
    */
  def imageEmbed(bytes: Array[Byte]): Array[Float] = {
    val (px, w, h) = ImageKit.decodeGray(bytes)
    if (w <= 0 || h <= 0) return new Array[Float](Dim)
    val pooled = ImageKit.resampleArea(px, w, h, Grid, Grid)
    val mean = pooled.sum / Dim
    pooled.map(v => (v - mean).toFloat)
  }

  /** The TRUE caption of an image: grid-cell tokens `c<i>_q<v/8>` for
    * ~7/8 of the cells (a human caption never describes everything —
    * cells where (i + salt) % 8 == 0 are omitted) behind a fixed filler
    * prefix. Stands in for an accurate alt-text.
    */
  def captionOf(bytes: Array[Byte], salt: Int): String = {
    val (px, w, h) = ImageKit.decodeGray(bytes)
    if (w <= 0 || h <= 0) return "undecodable placeholder"
    val pooled = ImageKit.resampleArea(px, w, h, Grid, Grid)
    val cells = pooled.indices
      .filter(i => (i + salt) % 8 != 0)
      .map(i => s"c${i}_q${math.min(31, (pooled(i) / 8).toInt)}")
    "a synthetic field with " + cells.mkString(" ")
  }

  /** Text tower stub: grid tokens reconstruct mid-bin cell values,
    * anything else hashes into a low-amplitude dim; centered like the
    * visual tower. Total on any string.
    */
  def textEmbed(caption: String): Array[Float] = {
    val v = new Array[Double](Dim)
    val present = new Array[Boolean](Dim)
    val noise = new Array[Double](Dim)
    val tok = """c(\d+)_q(\d+)""".r
    caption.split("\\s+").foreach {
      case tok(i, q) if i.toInt < Dim =>
        v(i.toInt) = q.toInt * 8 + 4; present(i.toInt) = true
      case w if w.nonEmpty =>
        val hsh = ImageKit.mix64(w.##.toLong)
        noise((hsh & 0x3f).toInt) += ((hsh >>> 6) % 9L).toDouble - 4.0
      case _ =>
    }
    // center over the DESCRIBED cells only; cells the caption omits stay
    // 0 — the centered visual tower's neutral value — rather than
    // inheriting -mean (which would let 8 absent cells dominate the norm)
    val np = present.count(identity)
    val mean = if (np == 0) 0.0 else v.sum / np
    Array.tabulate(Dim) { i =>
      ((if (present(i)) v(i) - mean else 0.0) + noise(i)).toFloat
    }
  }

  /** Cosine with the zero-vector convention cos(0, *) = 0 (an
    * undecodable image or empty caption is maximally unaligned, not NaN).
    */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Deterministic pairs corpus with mismatch plants: pair i carries its
    * own image's true caption, EXCEPT every 6th pair takes the caption of
    * image i+1 (the crawled-page mismatch: alt-text scraped off the wrong
    * <img>) and every 9th (not also 6th) a no-signal boilerplate caption
    * (the "stock photo" / SEO-spam alt-text). Both plant classes must
    * fail the gate; every true caption must pass.
    */
  def alignCorpus(spark: SparkSession, n: Int = 96): DataFrame = {
    import spark.implicits._
    val imgs = (0 until n).map { i =>
      val w = 48; val h = 32
      val fmt = if (i % 2 == 0) "png" else "jpeg"
      val px = ImageKit.genPixels(ImageKit.mix64(i * 9241L + 17L), 0, w, h)
      ImageKit.encode(px, w, h, fmt) -> fmt
    }
    val rows = (0 until n).map { i =>
      val (bytes, fmt) = imgs(i)
      val caption =
        if (i % 6 == 0) captionOf(imgs((i + 1) % n)._1, salt = (i + 1) % n)
        else if (i % 9 == 0) "premium stock photo download watermark free wallpaper"
        else captionOf(bytes, salt = i)
      (f"pair-$i%04d", s"img-$i", bytes, fmt, caption)
    }
    rows.toDF("pair_id", "image_id", "bytes", "fmt", "caption")
  }

  /** The gate: one decode-and-embed pass per row, zero exchanges. Tau
    * calibrated via graft.tools.AlignProbe on the fixed corpus: true
    * band [0.824, 0.983], swap band max 0.471, junk band max 0.085 —
    * 0.65 clears both plant classes by >= 0.17 either side.
    */
  def alignmentGate(pairs: DataFrame, tau: Double = 0.65): DataFrame = {
    import pairs.sparkSession.implicits._
    pairs.select("pair_id", "image_id", "bytes", "caption")
      .as[(String, String, Array[Byte], String)]
      .mapPartitions(_.map { case (pid, iid, bytes, caption) =>
        val c = cosine(imageEmbed(bytes), textEmbed(caption))
        (pid, iid, math.rint(c * 10000) / 10000)
      })
      .toDF("pair_id", "image_id", "clip_cos")
      .withColumn("aligned", col("clip_cos") >= tau)
  }

  def alignmentDemo(spark: SparkSession): DataFrame =
    alignmentGate(alignCorpus(spark)).orderBy("pair_id")
}
