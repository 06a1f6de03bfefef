package graft.operators

import graft.sources.Gen
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Fetched-payload validation: container sniffing + truncation audit over
  * the image+caption table's binary column — the cheap pre-decode gate a
  * fetch pipeline runs on every response BEFORE the expensive decode path
  * (c09's ImageIO round-trip): does the magic number match the declared
  * format, and is the container trailer intact (a missing trailer is the
  * signature of a truncated download)?
  *
  * Scale shape: pure codegen projection fused into the scan — only <=8-byte
  * slices of the binary column are ever compared (substring on binary +
  * hex), the payload itself is neither decoded, shuffled, nor collected;
  * per-format aggregation exchanges carry (fmt, 3 longs). Magic/trailer
  * constants are the public container specs: PNG signature 89 50 4E 47 0D
  * 0A 1A 0A and IEND trailer chunk (RFC 2083 / ISO 15948), JPEG SOI FF D8
  * FF and EOI FF D9 (ITU T.81).
  */
object FetchAudit {

  /** Sniffed container from the leading magic bytes. */
  def sniffedFmtCol(bytes: Column): Column =
    when(hex(substring(bytes, 1, 8)) === "89504E470D0A1A0A", "png")
      .when(hex(substring(bytes, 1, 3)) === "FFD8FF", "jpeg")
      .otherwise("unknown")

  /** Container trailer intact for the SNIFFED format: PNG streams end with
    * the IEND chunk (type + CRC = last 8 bytes), JPEG with the EOI marker.
    */
  def trailerOkCol(bytes: Column): Column = {
    val sniffed = sniffedFmtCol(bytes)
    when(sniffed === "png",
      hex(substring(bytes, -8, 8)).startsWith("49454E44"))
      .when(sniffed === "jpeg", hex(substring(bytes, -2, 2)) === "FFD9")
      .otherwise(lit(false))
  }

  /** Planted-fault corpus: every 7th image truncated by 16 bytes (magic
    * intact, trailer gone), every 11th (not also 7th) mislabeled png<->jpeg
    * (bytes untouched). Deterministic — the spec's mirror replants
    * identically.
    */
  private[operators] def plantedFetches(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val fmt = if (i % 2 == 0) "png" else "jpeg"
      val row = Gen.snapshotRow(s"img-$i", variant = 0, captionVer = 0,
        fmt = fmt, epoch = 0)
      val bytes =
        if (i % 7 == 0) row.bytes.dropRight(16)
        else row.bytes
      val declared =
        if (i % 7 != 0 && i % 11 == 0) (if (fmt == "png") "jpeg" else "png")
        else fmt
      (row.image_id, bytes, declared)
    }
    rows.toDF("image_id", "bytes", "fmt")
  }

  /** c55 — per-image validation verdicts (rows-only gate; mirror-golden in
    * FetchAuditSpec): fmt as declared, sniffed container, trailer health,
    * and the admit verdict the fetch pipeline would act on.
    */
  def validationReport(spark: SparkSession, n: Int = 77): DataFrame = {
    val fetches = plantedFetches(spark, n)
    fetches.select(col("image_id"), col("fmt"),
        sniffedFmtCol(col("bytes")).as("sniffed"),
        trailerOkCol(col("bytes")).as("trailer_ok"))
      .withColumn("admit", col("fmt") === col("sniffed") && col("trailer_ok"))
      .orderBy("image_id")
  }

  /** Per-declared-format rollup (what the fetch-health dashboard reads). */
  def validationSummary(spark: SparkSession, n: Int = 77): DataFrame =
    validationReport(spark, n)
      .groupBy("fmt")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("fmt") =!= col("sniffed"), 1L).otherwise(0L)).as("n_mislabeled"),
        sum(when(!col("trailer_ok"), 1L).otherwise(0L)).as("n_truncated"),
        sum(when(col("admit"), 1L).otherwise(0L)).as("n_admitted"))
      .orderBy("fmt")

  /** JVM mirror of the verdict logic (independent imperative path over the
    * raw byte arrays — no Spark, no hex detour).
    */
  private[operators] def mirrorVerdict(bytes: Array[Byte], declared: String)
      : (String, Boolean, Boolean) = {
    def startsWith(sig: Array[Int]): Boolean =
      bytes.length >= sig.length && sig.indices.forall(i => (bytes(i) & 0xff) == sig(i))
    val sniffed =
      if (startsWith(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))) "png"
      else if (startsWith(Array(0xff, 0xd8, 0xff))) "jpeg"
      else "unknown"
    val n = bytes.length
    val trailerOk = sniffed match {
      case "png" => n >= 8 && (bytes(n - 8) & 0xff) == 'I' &&
        (bytes(n - 7) & 0xff) == 'E' && (bytes(n - 6) & 0xff) == 'N' &&
        (bytes(n - 5) & 0xff) == 'D'
      case "jpeg" => n >= 2 && (bytes(n - 2) & 0xff) == 0xff &&
        (bytes(n - 1) & 0xff) == 0xd9
      case _ => false
    }
    (sniffed, trailerOk, declared == sniffed && trailerOk)
  }
}
