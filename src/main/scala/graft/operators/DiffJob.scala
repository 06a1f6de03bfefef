package graft.operators

import graft.model.{Revision, Snapshot}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** E2 — revision detection (SURVEY.md §3 E2; north_rule: "detects revised
  * pages via phash/caption comparison against prior snapshots, preserving
  * news-diff's dedupe-and-revision-tracking behavior").
  *
  * One window (lag over image_id ordered by epoch) + one comparison stage.
  * The scan NEVER touches `bytes` — Catalyst ColumnPruning pushes the
  * 4-column projection into the parquet reader, so the dominant (binary)
  * column stays on disk; at 100 TB this is the difference between a
  * metadata-sized shuffle and an impossible one (SURVEY.md §7.3.2).
  */
object DiffJob {

  /** Classify every row of epoch `epoch` against its immediately preceding
    * version. `history` must contain all snapshots with snap_epoch <= epoch.
    *   new              — no prior version of image_id
    *   revised_pixels   — hamming64(phash, prev) > tau, caption equal
    *   revised_caption  — caption differs, phash within tau
    *   revised_both     — both
    *   unchanged        — neither
    */
  def revisions(history: DataFrame, epoch: Int, tau: Int): Dataset[Revision] = {
    val w = Window.partitionBy("image_id").orderBy("epoch")
    val pruned = history.select("image_id", "epoch", "phash", "caption")
    val withPrev = pruned
      .withColumn("prev_phash", lag("phash", 1).over(w))
      .withColumn("prev_caption", lag("caption", 1).over(w))
      .withColumn("prev_epoch", lag("epoch", 1).over(w))
      .where(col("epoch") === epoch)
    classifyWithPrev(withPrev, tau)
  }

  /** Scale-safe per-epoch form: classify `current` (epoch e rows) against
    * the maintained latest-version table as of e-1 (Snapshots.readLatest).
    * The latest prior version IS lag(1) over history, so this equals
    * `revisions` row-for-row (golden-tested), but per-epoch cost is a single
    * equi-join — O(|current| + |latest|), FLAT in epoch count — where the
    * window form rescans and re-sorts the whole history every epoch.
    */
  def revisionsFromLatest(
      current: DataFrame,
      latestPrev: DataFrame,
      epoch: Int,
      tau: Int): Dataset[Revision] = {
    val cur = current.select("image_id", "epoch", "phash", "caption")
      .where(col("epoch") === epoch)
    val prev = latestPrev.select(
      col("image_id"),
      col("epoch").as("prev_epoch"),
      col("phash").as("prev_phash"),
      col("caption").as("prev_caption"))
    classifyWithPrev(cur.join(prev, Seq("image_id"), "left"), tau)
  }

  /** Shared classification tail over (image_id, epoch, phash, caption,
    * prev_phash, prev_caption, prev_epoch).
    */
  private def classifyWithPrev(withPrev: DataFrame, tau: Int): Dataset[Revision] = {
    import withPrev.sparkSession.implicits._
    withPrev
      .withColumn("phash_dist",
        when(col("prev_phash").isNull, 0)
          .otherwise(bit_count(col("phash").bitwiseXOR(col("prev_phash")))))
      .withColumn("caption_dist",
        when(col("prev_caption").isNull, 0)
          .otherwise(levenshtein(col("caption"), col("prev_caption"))))
      .withColumn("change",
        when(col("prev_epoch").isNull, "new")
          .when(col("phash_dist") > tau && col("caption_dist") > 0, "revised_both")
          .when(col("phash_dist") > tau, "revised_pixels")
          .when(col("caption_dist") > 0, "revised_caption")
          .otherwise("unchanged"))
      .select(col("image_id"), col("epoch").cast("int"),
        coalesce(col("prev_epoch"), lit(-1)).cast("int").as("prev_epoch"),
        col("change"), col("phash_dist").cast("int"),
        col("caption_dist").cast("int"))
      .as[Revision]
  }

  /** c49 — word-level diff SCRIPTS for this epoch's caption revisions:
    * the relational form of news-diff's user-facing version diff (the
    * rendered old/new word spans), kept out of the engine until now as
    * "presentation". One row per span: (image_id, seq, op in
    * {keep,del,ins}, span), minimal LCS script via TextKit.wordDiff.
    *
    * Scale shape: the quadratic kernel runs ONLY on pairs the (cheap,
    * codegen) classifier already marked caption-revised — a small fraction
    * of an epoch — and captions are short; prev captions come from the
    * maintained latest table (same join as revisionsFromLatest, one
    * broadcast-or-shuffle on image_id), never from a history scan.
    */
  def captionDiffs(
      current: DataFrame,
      latestPrev: DataFrame,
      epoch: Int): DataFrame = {
    import current.sparkSession.implicits._
    val cur = current.select("image_id", "epoch", "caption")
      .where(col("epoch") === epoch)
    val prev = latestPrev.select(
      col("image_id"), col("caption").as("prev_caption"))
    val changed = cur.join(prev, Seq("image_id"))
      .where(col("caption") =!= col("prev_caption"))
      .select("image_id", "prev_caption", "caption")
      .as[(String, String, String)]
    changed.flatMap { case (id, from, to) =>
      graft.functions.TextKit.wordDiff(from, to).zipWithIndex.map {
        case ((op, span), k) => (id, k, op, span)
      }
    }.toDF("image_id", "seq", "op", "span")
      .orderBy("image_id", "seq")
  }

  /** c49 demo corpus: 40 caption pairs exercising every edit family —
    * i%4==0 replaces a middle word, 1 deletes two words, 2 inserts a
    * phrase, 3 swaps the tail words (which LCS must render as del+ins).
    */
  def captionDiffCorpus(spark: SparkSession, n: Int = 40): (DataFrame, DataFrame) = {
    import spark.implicits._
    val base = (0 until n).map { i =>
      (s"http://h${i % 5}.example/art-$i",
        s"mayor opens the new $i bridge over the east river")
    }
    val edited = base.zipWithIndex.map { case ((id, cap), i) =>
      val ws = cap.split(" ")
      val out = (i % 4) match {
        case 0 => (ws.take(2) ++ Array("reopens") ++ ws.drop(3)).mkString(" ")
        case 1 => (ws.take(4) ++ ws.drop(6)).mkString(" ")
        case 2 => ((ws.take(5) :+ "after repairs") ++ ws.drop(5)).mkString(" ")
        case _ => (ws.dropRight(2) ++ ws.takeRight(2).reverse).mkString(" ")
      }
      (id, out)
    }
    val prev = base.toDF("image_id", "caption")
    val cur = edited.toDF("image_id", "caption")
      .withColumn("epoch", lit(1))
    (cur, prev)
  }

  /** c49 demo: diff scripts over the demo corpus. */
  def captionDiffDemo(spark: SparkSession): DataFrame = {
    val (cur, prev) = captionDiffCorpus(spark)
    captionDiffs(cur, prev, epoch = 1)
  }

  /** Local mirror for golden tests: classify one (current, prev) pair. */
  def classifyLocal(cur: Snapshot, prev: Option[Snapshot], tau: Int): Revision = {
    prev match {
      case None => Revision(cur.image_id, cur.epoch, -1, "new", 0, 0)
      case Some(p) =>
        val pd = java.lang.Long.bitCount(cur.phash ^ p.phash)
        val cd = levenshteinLocal(cur.caption, p.caption)
        val change =
          if (pd > tau && cd > 0) "revised_both"
          else if (pd > tau) "revised_pixels"
          else if (cd > 0) "revised_caption"
          else "unchanged"
        Revision(cur.image_id, cur.epoch, p.epoch, change, pd, cd)
    }
  }

  /** Adaptive recrawl scheduling (c25) — the revisit policy the reference
    * crawler runs between epochs: an article whose content changed at its
    * last fetch is probably still being edited (breaking news), so it is
    * due again next epoch; articles that keep coming back unchanged back
    * off linearly up to `maxInterval`. Pure integer column arithmetic over
    * the cumulative revisions table:
    *
    *   staleness = last_fetch_epoch - last epoch with a real change
    *               ('new' counts as a change: fresh articles are hot)
    *   interval  = min(maxInterval, staleness + 1)
    *   due@E     = E - last_fetch_epoch >= interval
    *
    * Scale: one hash agg over (image_id, epoch, change) — the revisions
    * table is already the small derived table (no payloads), and the agg
    * is partial+final on the 10^10-URL tier like every A-family op.
    * Output feeds the frontier as (url, priority = 1/interval): the
    * politeness scheduler then treats recrawls like any other seed.
    */
  def recrawlSchedule(revisions: DataFrame, atEpoch: Int,
                      maxInterval: Int = 8): DataFrame =
    revisions
      .groupBy("image_id")
      .agg(max("epoch").as("last_fetch"),
        coalesce(max(when(col("change") =!= "unchanged", col("epoch"))), lit(-1))
          .as("last_change"))
      .withColumn("staleness", col("last_fetch") - col("last_change"))
      .withColumn("interval",
        least(lit(maxInterval), col("staleness") + lit(1)).cast("int"))
      .withColumn("due", (lit(atEpoch) - col("last_fetch")) >= col("interval"))
      .withColumn("priority", round(lit(1.0) / col("interval"), 4))
      .select("image_id", "last_fetch", "last_change", "interval", "due", "priority")

  /** CHANGE-RATE recrawl scheduling (c45 wired to the real revision
    * history — Cho & Garcia-Molina TOIT'03 beside c25's staleness
    * backoff): interval from the page's whole observed change FREQUENCY,
    * max(1, n_obs div (n_changes + 1)), the engine-exact integer form of
    * the monotone MLE (RecrawlOps doc). The two policies genuinely
    * disagree: a page that changed once EARLY then went quiet backs off
    * fast under staleness (only the recency of change matters) but keeps
    * a moderate rate-based interval here (one change in n observations is
    * still a rate); a page changing every other epoch gets interval 1
    * from staleness whenever its last fetch changed, interval 2 here.
    * Same output shape as [[recrawlSchedule]] so the pipeline swaps
    * policies behind one column contract.
    */
  def recrawlScheduleChangeRate(revisions: DataFrame, atEpoch: Int,
                                maxInterval: Int = 8): DataFrame =
    revisions
      .groupBy("image_id")
      .agg(max("epoch").as("last_fetch"),
        count(lit(1)).cast("int").as("n_obs"),
        sum(when(col("change") =!= "unchanged", 1).otherwise(0))
          .cast("int").as("n_changes"))
      .withColumn("interval",
        least(lit(maxInterval),
          greatest(lit(1), expr("n_obs div (n_changes + 1)"))).cast("int"))
      .withColumn("due", (lit(atEpoch) - col("last_fetch")) >= col("interval"))
      .withColumn("priority", round(lit(1.0) / col("interval"), 4))
      .select("image_id", "last_fetch", "n_obs", "n_changes", "interval",
        "due", "priority")

  def levenshteinLocal(a: String, b: String): Int = {
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    for (j <- 0 to b.length) prev(j) = j
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }
}
