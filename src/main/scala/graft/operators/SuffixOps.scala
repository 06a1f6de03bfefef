package graft.operators

import graft.functions.TextKit
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** EXACT substring-level duplicate detection via distributed prefix-doubling
  * suffix ranks — the exact-match complement to the winnowed-anchor SCREEN
  * (TextOps.repeatedSpans samples anchors and can miss short overlaps; this
  * operator finds EVERY duplicated window of length >= L, the guarantee the
  * "exact substring dedup" pass of large-LM corpus pipelines is defined by;
  * cf. Lee et al., "Deduplicating Training Data Makes Language Models
  * Better", ACL 2022 — their suffix-array formulation; prefix doubling is
  * Karp-Miller-Rosenberg 1972 / Manber-Myers 1990).
  *
  * Why not materialize every length-L window and group by content? That
  * shuffles O(corpus_bytes * L) — at L=64 a 64x write amplification of a
  * 100 TB corpus. Prefix doubling instead seeds an 8-byte window identity
  * per position (hashed in the SCAN stage, before any exchange — the text
  * column never shuffles) and composes identities by doubling:
  * id_{2w}(pos) = hash(id_w(pos), id_w(pos+w)). Each round is ONE
  * sort-merge self-join of an (doc_id:long, pos:int, r:long) table on
  * (doc_id, pos+w) — int/long-only exchanges, log2(L/8) rounds. A window of
  * arbitrary L (not a power of two) is finished Manber-Myers-style with one
  * overlapping compose: id_L(pos) = hash(id_w(pos), id_w(pos+L-w)) for the
  * largest power-of-two w <= L (overlap is harmless for identity).
  *
  * Hash composition is injective only w.h.p., so a verify stage restores
  * exactness (the t05 discipline): positions whose composed key collides
  * with another position are re-joined to the payload ONCE (dup-rate-sized
  * candidate set), the actual L-char window is extracted and grouped BY
  * CONTENT — false candidates die, true duplicates are never missed (equal
  * text implies equal key). Every claim downstream is content-exact.
  *
  * Downstream actions mirror the winnowed family's shape: maximal dup RUNS
  * per doc (adjacent duplicated positions merged), a per-window survivor
  * (global min (doc_id, pos) occurrence keeps its copy), and a span-CLIPPED
  * corpus through the same TextKit.clipSpans kernel t10 uses (offsets are
  * char offsets == byte offsets on the ASCII test corpus; the kernel clips
  * byte ranges).
  */
object SuffixOps {

  /** (doc_id, pos, k): k identifies the length-L window at pos (hash
    * identity; see verify stage for exactness). Positions carry every pos
    * with a full window: pos <= len(text) - L.
    *
    * Every compose step of the prefix doubling joins a document's rank
    * only with ANOTHER RANK OF THE SAME DOCUMENT — the join key was always
    * (doc_id, pos) — so the whole doubling ladder runs as one codegen'd
    * per-doc kernel in the scan stage (TextKit.windowKeyArr, same hash
    * chain value-for-value) and the operator performs ZERO exchanges where
    * the former form paid log2(L/8) corpus-wide self sort-merge joins
    * (guide §2.4: remove shuffles outright). Text still never reaches an
    * exchange; per-doc memory is O(len), fine for document-sized rows.
    */
  def windowKeys(corpus: DataFrame, L: Int): DataFrame = {
    require(L >= 1, "window length must be positive")
    val spark = corpus.sparkSession
    corpus
      .where(length(col("text")) >= L)
      .select(col("doc_id"),
        posexplode(graft.functions.GraftFunctions.windowKeys(spark, L, col("text"))))
      .select(col("doc_id"), col("pos"), col("col").as("k"))
  }

  /** Content-EXACT duplicated-window positions: every (doc_id, pos) whose
    * length-L window occurs more than once in the corpus, with the
    * occurrence count and whether this position is the content group's
    * survivor (global min (doc_id, pos)). Key-collision candidates are
    * verified against the actual window text (candidate set only — the
    * payload joins once on doc_id and is never shuffled by window content
    * except for the dup-rate-sized candidates).
    */
  def dupWindowPositions(corpus: DataFrame, L: Int): DataFrame = {
    val keys = windowKeys(corpus, L)
    val hot = keys.groupBy("k").agg(count(lit(1)).as("c"))
      .where(col("c") > 1).select("k")
    val cand = keys.join(hot, Seq("k"), "left_semi")
    val wins = cand.join(corpus.select("doc_id", "text"), Seq("doc_id"))
      .select(col("doc_id"), col("pos"),
        expr(s"substring(text, pos + 1, $L)").as("win"))
    val groups = wins.groupBy("win")
      .agg(count(lit(1)).as("n_occ"),
        min(struct(col("doc_id"), col("pos"))).as("surv"))
      .where(col("n_occ") > 1)
    wins.join(groups, Seq("win"))
      .select(col("doc_id"), col("pos"), col("n_occ"),
        (col("surv.doc_id") === col("doc_id") &&
          col("surv.pos") === col("pos")).as("is_survivor"))
  }

  /** t29 — DuckDB-oracleable aggregate over the planted partial-copy
    * corpus (TextOps.spanCorpus): per doc, how many positions start an
    * exactly-duplicated length-L window, and the first/last such position.
    * The oracle brute-forces every window with generate_series+substr —
    * the O(n*L) shape this operator exists to avoid, affordable at sf0.01.
    */
  def dupWindowReport(spark: SparkSession, dir: String, L: Int = 64): DataFrame =
    dupWindowPositions(TextOps.spanCorpus(spark, dir), L)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_dup"),
        min("pos").cast("long").as("first_pos"),
        max("pos").cast("long").as("last_pos"))
      .orderBy("doc_id")

  /** Maximal duplicated RUNS: adjacent (pos step <= 1) non-survivor
    * duplicated positions merged per doc into [from_pos, to_excl) char
    * extents (to_excl = last window start + L). Survivor positions are
    * exempt — each duplicated content keeps exactly its min-(doc_id,pos)
    * occurrence, the Lee-et-al "remove all but one copy" action.
    */
  def dupSpans(corpus: DataFrame, L: Int): DataFrame = {
    val wdoc = Window.partitionBy("doc_id").orderBy("pos")
    dupWindowPositions(corpus, L)
      .where(!col("is_survivor"))
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(wdoc) <= lit(1), 0).otherwise(1))
      .withColumn("run", sum("brk").over(wdoc))
      .groupBy("doc_id", "run")
      .agg(min("pos").as("from_pos"), (max("pos") + L).as("to_excl"),
        count(lit(1)).cast("long").as("n_windows"))
      .select("doc_id", "from_pos", "to_excl", "n_windows")
  }

  /** The corpus ACTION: every non-survivor duplicated run clipped out,
    * text outside preserved — same extents-aggregate + payload-join-once +
    * when() fast-path shape as t10, same TextKit.clipSpans kernel (k=0:
    * extents are already exclusive-end char ranges).
    */
  def exactClippedCorpus(corpus: DataFrame, L: Int): DataFrame = {
    val extents = dupSpans(corpus, L)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("from_pos").cast("int").as("f"),
        col("to_excl").cast("int").as("t"))).as("extents"))
    val clip = udf { (text: String, ext: Seq[org.apache.spark.sql.Row]) =>
      TextKit.clipSpans(text, ext.map(r => (r.getInt(0), r.getInt(1))), 0)
    }
    corpus.join(extents, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("extents").isNull, col("text"))
          .otherwise(clip(col("text"), col("extents"))).as("text"))
  }

  /** t30 — driver-facing rows for the exact-clip action (clipped text
    * itself is golden-gated vs the single-threaded mirror in SuffixSpec).
    */
  def exactClipReport(spark: SparkSession, dir: String, L: Int = 64): DataFrame =
    exactClippedCorpus(TextOps.spanCorpus(spark, dir), L)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        xxhash64(col("text")).as("clip_hash"))
      .orderBy("doc_id")

  /** All length-L windows WITH text of a (doc_id, text) frame — the
    * O(n*L) materialization; reserved for SMALL sides (benchmark suites)
    * and oracles.
    */
  private def windowsWithText(df: DataFrame, L: Int): DataFrame =
    df.where(length(col("text")) >= L)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), length(col("text")) - L)).as("pos"))
      .select(col("doc_id"), col("pos"),
        expr(s"substring(text, pos + 1, $L)").as("win"))

  /** t31 — EXACT-substring benchmark decontamination (the verbatim-overlap
    * gate of published LM evals — GPT-3 App. C / PaLM use 8-13-gram or
    * char-window exact collision against the eval set; t13 is the word
    * n-gram form, this is the character form with t29's machinery): every
    * corpus position whose length-L window appears VERBATIM in the
    * benchmark, aggregated per doc.
    *
    * Scale shape: the benchmark side is eval-suite-sized, so its window
    * SET (content) broadcasts; the corpus side never materializes windows
    * — its hashed keys (scan-fused, text never shuffled) are semi-joined
    * against the benchmark's keys first, and only the collision-rate-sized
    * candidate set extracts text for the exact content join.
    */
  def exactContamination(corpus: DataFrame, bench: DataFrame, L: Int): DataFrame = {
    val benchKeys = windowKeys(bench, L).select("k").distinct()
    val cand = windowKeys(corpus, L).join(benchKeys, Seq("k"), "left_semi")
    val candWins = cand.join(corpus.select("doc_id", "text"), Seq("doc_id"))
      .select(col("doc_id"), col("pos"),
        expr(s"substring(text, pos + 1, $L)").as("win"))
    val benchWins = windowsWithText(bench, L).select("win").distinct()
    candWins.join(broadcast(benchWins), Seq("win"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_contaminated"),
        min("pos").cast("long").as("first_pos"),
        max("pos").cast("long").as("last_pos"))
      .orderBy("doc_id")
  }

  /** Driver-facing t31 over the t13 fixtures: leaked corpus (quote docs
    * copy each benchmark doc's first 20 tokens verbatim) vs the benchmark
    * slice, L=64.
    */
  def exactContaminationReport(spark: SparkSession, dir: String, L: Int = 64): DataFrame =
    exactContamination(TextOps.leakedCorpus(spark, dir),
      TextOps.benchmarkDocs(spark, dir), L)

  // ---- single-threaded mirror (shared by SuffixSpec goldens) ------------

  /** Brute-force mirror: every window materialized and grouped by content.
    * Returns (doc_id, pos) -> (n_occ, is_survivor).
    */
  private[graft] def mirrorDupPositions(
      docs: Seq[(Long, String)], L: Int): Map[(Long, Int), (Long, Boolean)] = {
    val byWin = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[(Long, Int)]]
    docs.foreach { case (id, text) =>
      var p = 0
      while (p + L <= text.length) {
        byWin.getOrElseUpdate(text.substring(p, p + L),
          scala.collection.mutable.ArrayBuffer.empty) += ((id, p))
        p += 1
      }
    }
    byWin.valuesIterator.filter(_.length > 1).flatMap { occ =>
      val surv = occ.minBy(identity)
      occ.iterator.map(o => o -> (occ.length.toLong, o == surv))
    }.toMap
  }

  /** Brute-force mirror of exactContamination. */
  private[graft] def mirrorContamination(
      corpus: Seq[(Long, String)], bench: Seq[(Long, String)],
      L: Int): Map[Long, (Long, Long, Long)] = {
    val benchWins = bench.iterator.flatMap { case (_, t) =>
      (0 to t.length - L).iterator.map(p => t.substring(p, p + L))
    }.toSet
    corpus.flatMap { case (id, t) =>
      val hits = (0 to t.length - L).filter(p => benchWins(t.substring(p, p + L)))
      if (hits.isEmpty) None
      else Some(id -> ((hits.length.toLong, hits.min.toLong, hits.max.toLong)))
    }.toMap
  }

  /** Mirror of dupSpans + exactClippedCorpus via the same clip kernel. */
  private[operators] def mirrorClipped(
      docs: Seq[(Long, String)], L: Int): Map[Long, String] = {
    val dup = mirrorDupPositions(docs, L)
    val extentsByDoc = dup.iterator
      .collect { case ((id, p), (_, false)) => (id, p) }
      .toSeq.groupBy(_._1)
      .map { case (id, ps) =>
        val sorted = ps.map(_._2).sorted
        val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        sorted.foreach { p =>
          if (runs.nonEmpty && p - (runs.last._2 - L) <= 1) {
            val (f, _) = runs.last
            runs(runs.length - 1) = (f, p + L)
          } else runs += ((p, p + L))
        }
        id -> runs.toSeq
      }
    docs.map { case (id, text) =>
      id -> TextKit.clipSpans(text, extentsByDoc.getOrElse(id, Nil), 0)
    }.toMap
  }
}
