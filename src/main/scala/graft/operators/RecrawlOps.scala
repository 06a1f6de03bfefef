package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** c45 — change-rate-adaptive RECRAWL scheduling (Cho & Garcia-Molina,
  * "Effective Page Refresh Policies for Web Crawlers" TODS'03 and
  * "Estimating Frequency of Change" TOIT'03): pages change at wildly
  * different rates, and a crawler that revisits uniformly wastes budget
  * re-fetching static pages while hot pages rot stale. Estimate each
  * page's change rate from its observation history (did fetch e return a
  * different content hash than fetch e-1?) and set the revisit interval
  * inversely — the freshness counterpart of c30's latency-adaptive
  * politeness (how OFTEN to come back vs how FAST to go).
  *
  * DELIBERATE deviation (the t21/t15 fixed-point lesson): TOIT'03's MLE
  * is lambda_hat = -ln((n - X + 0.5)/(n + 0.5)), but ln() is not
  * bit-identical across engines, and for fixed n the MLE is strictly
  * monotone in X — so `interval = max(1, n div (X + 1))` induces exactly
  * the ordering the estimator would, in engine-exact BIGINT arithmetic
  * with no rounding tolerance anywhere.
  *
  * Scale shape: the history is (page, epoch) rows — the change flag is a
  * codegen'd per-row md5 expression fused into the scan, the estimate is
  * one map-side-combined groupBy(page), the schedule a pure projection.
  * One exchange total, carrying (page_id, two longs). At 100 TB the
  * history table is the crawl's own fetch log; here it is synthesized
  * deterministically (md5 draw per (page, epoch) against a per-page
  * latent propensity — the established md5-threshold discipline).
  */
object RecrawlOps {

  /** Observation epochs per page (the estimator's n). */
  val ObsEpochs = 16

  /** Deterministic per-(page, epoch) change observations: page's latent
    * propensity rho = page_id % 8 out of 8; epoch e observed a change iff
    * the md5 draw for (page, e) lands below rho/8. rho=0 pages never
    * change; rho=7 pages change ~7/8 of the time.
    */
  def changeHistory(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("page_id"), col("source").as("host"))
      .select(col("page_id"), col("host"),
        explode(sequence(lit(1), lit(ObsEpochs))).as("epoch"))
      .withColumn("changed",
        conv(substring(md5(concat(col("page_id").cast("string"), lit(":"),
          col("epoch").cast("string"))), 1, 6), 16, 10).cast("long") % 8 <
          col("page_id") % 8)

  /** The c45 schedule: per page, observed changes over [[ObsEpochs]]
    * epochs, the integer revisit interval, and the next-due epoch
    * (observation window ends at epoch [[ObsEpochs]]).
    */
  def recrawlSchedule(spark: SparkSession, dir: String): DataFrame =
    changeHistory(spark, dir)
      .groupBy("page_id")
      .agg(count(lit(1)).cast("long").as("n_obs"),
        sum(when(col("changed"), 1L).otherwise(0L)).as("n_changes"))
      .withColumn("revisit_interval",
        greatest(lit(1L), expr("n_obs div (n_changes + 1)")))
      .withColumn("next_due", lit(ObsEpochs.toLong) + col("revisit_interval"))
      .orderBy("page_id")

  /** c92 — FRESHNESS-SLA rollup per host: c45 sets each page's revisit
    * interval; this is the dashboard row that says whether the crawler
    * is KEEPING UP — per host, the fraction of pages whose age since
    * last fetch exceeds their own adaptive interval (Cho & Garcia-
    * Molina's freshness objective read as an SLA). Ages are synthesized
    * deterministically (page_id % 5 — a 5-epoch fetch round-robin, the
    * established no-RNG discipline); everything is BIGINT counts and
    * integer division, hence oracled. A host with high overdue_bp needs
    * budget (c34) before it needs priority retuning (c88).
    *
    * Scale: one history scan → per-page map-side agg → per-host rollup;
    * exchanges carry (page/host, small longs) only.
    */
  def freshnessSla(spark: SparkSession, dir: String): DataFrame =
    changeHistory(spark, dir)
      .groupBy("page_id", "host")
      .agg(count(lit(1)).cast("long").as("n_obs"),
        sum(when(col("changed"), 1L).otherwise(0L)).as("n_changes"))
      .withColumn("interval",
        greatest(lit(1L), expr("n_obs div (n_changes + 1)")))
      .withColumn("age", pmod(col("page_id"), lit(5L)))
      .groupBy("host")
      .agg(count(lit(1)).as("n_pages"),
        sum(when(col("age") > col("interval"), 1L).otherwise(0L))
          .as("n_overdue"),
        min("interval").as("min_interval"),
        max("interval").as("max_interval"))
      .select(col("host"), col("n_pages"), col("n_overdue"),
        expr("(10000 * n_overdue) div n_pages").as("overdue_bp"),
        col("min_interval"), col("max_interval"))
      .orderBy("host")

  /** c93 — per-host BYTE-DEMAND forecast by exact integer OLS (the q68
    * machinery applied to capacity planning): c54 meters what each host
    * SPENT; this fits bytes-per-epoch over the observed window and
    * forecasts the next epoch, which is the number c34's allocation
    * actually needs ahead of time. History is synthesized
    * deterministically (per-host base + linear trend + an md5 noise
    * term — the c45 discipline); slope and forecast are ratios of
    * BIGINT moment combinations emitted as one rounded division each —
    * hash-exact.
    *
    * Scale: |hosts|×epochs rows, one map-side moment agg per host.
    */
  val FcEpochs = 8

  def byteDemandForecast(spark: SparkSession, dir: String): DataFrame = {
    val hist = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source").as("host")).distinct()
      .withColumn("hh",
        conv(substring(md5(concat(lit("bf:"), col("host"))), 1, 6), 16, 10)
          .cast("long"))
      .select(col("host"), col("hh"),
        explode(sequence(lit(1L), lit(FcEpochs.toLong))).as("e"))
      .withColumn("bytes",
        lit(10000L) + (col("hh") % 7) * 1000L * col("e") +
          conv(substring(md5(concat(lit("bfn:"), col("host"), lit(":"),
            col("e").cast("string"))), 1, 6), 16, 10).cast("long") % 997)
    val m = hist.groupBy("host")
      .agg(count(lit(1)).as("n"), sum("e").as("sx"), sum("bytes").as("sy"),
        sum(col("e") * col("e")).as("sxx"),
        sum(col("e") * col("bytes")).as("sxy"))
    m.select(col("host"), col("n"), col("sy").as("total_bytes"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
          4).as("slope_bytes_per_epoch"),
        // forecast(n+1) = (Σy·Σxx − Σx·Σxy + (n+1)·(nΣxy − ΣxΣy)) / (nΣxx − Σx²)
        round((col("sy") * col("sxx") - col("sx") * col("sxy")
          + (col("n") + 1) * (col("n") * col("sxy") - col("sx") * col("sy")))
          .cast("double")
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
          4).as("forecast_next_epoch"))
      .orderBy("host")
  }

  /** Epochs observed per host for the c90 changepoint screen. */
  val CpEpochs = 24
  /** Pages sampled per (host, epoch) — x_t counts changes among these. */
  val CpDraws = 8
  /** Planted shift point: shifted hosts jump 1/8 -> 6/8 after this. */
  val CpShiftEpoch = 12
  /** CUSUM reference value k (changes/epoch the drift term forgives). */
  val CpRef = 3L
  /** CUSUM alarm threshold h (cumulative excess changes above k). */
  val CpThreshold = 8L

  /** c90 — CUSUM CHANGEPOINT detection on per-host change rates (Page,
    * Biometrika'54): c45 estimates each page's stationary rate, but the
    * operational failure mode is the NON-stationary host — a site
    * redesign or a CMS migration makes yesterday's revisit intervals
    * wrong all at once, and a mean over the whole history dilutes the
    * shift for many epochs. The one-sided CUSUM flags the shift within a
    * few epochs of onset. The textbook recursion S_t = max(0, S_{t-1} +
    * x_t − k) is sequential, so we use its exact closed form —
    * S_t = cum_t − min(0, running_min(cum)) with cum = Σ(x − k) — which
    * is two window passes over integers: parallel, order-free, and
    * engine-exact (hence DuckDB-oracled). Alarm = first epoch with
    * S_t ≥ h; the report carries pre/post-shift change totals so the
    * verdict is auditable from its own row.
    *
    * Scale: the history is (host, epoch) rows — hosts × 24, tiny next to
    * the fetch log it summarizes; both windows share the one
    * hash-exchange on host, and the synthesis md5 draws are codegen'd
    * per-row expressions (the c45 discipline; salt "cp:" namespaces
    * them).
    */
  def hostChangeCounts(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source").as("host")).distinct()
      .withColumn("shifted",
        conv(substring(md5(concat(lit("cp-shift:"), col("host"))), 1, 6),
          16, 10).cast("long") % 3 === 0)
      .select(col("host"), col("shifted"),
        explode(sequence(lit(1L), lit(CpEpochs.toLong))).as("epoch"))
      .select(col("host"), col("shifted"), col("epoch"),
        explode(sequence(lit(1), lit(CpDraws))).as("i"))
      .withColumn("rate",
        when(col("shifted") && col("epoch") > CpShiftEpoch, lit(6L))
          .otherwise(lit(1L)))
      .withColumn("changed",
        (conv(substring(md5(concat(lit("cp:"), col("host"), lit(":"),
          col("epoch").cast("string"), lit(":"), col("i").cast("string"))),
          1, 6), 16, 10).cast("long") % 8 < col("rate")).cast("long"))
      .groupBy("host", "shifted", "epoch")
      .agg(sum("changed").as("x"))

  def changepointReport(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy("epoch")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val scored = hostChangeCounts(spark, dir)
      .withColumn("cum", sum(col("x") - CpRef).over(w))
      .withColumn("s", col("cum") - least(lit(0L), min("cum").over(w)))
    // group on host alone (shifted is host-determined, recovered by max)
    // so the distinct/window/agg chain shares ONE host exchange
    scored.groupBy("host")
      .agg(max("shifted").as("shifted"), max("s").as("max_s"),
        min(when(col("s") >= CpThreshold, col("epoch"))).as("alarm_epoch"),
        sum(when(col("epoch") <= CpShiftEpoch, col("x"))).as("pre_changes"),
        sum(when(col("epoch") > CpShiftEpoch, col("x"))).as("post_changes"))
      .withColumn("verdict",
        when(col("alarm_epoch").isNotNull, lit("rate_shift"))
          .otherwise(lit("stable")))
      .orderBy("host")
  }

  /** c95 — URL MORTALITY / TOMBSTONE policy over a deterministic
    * synthesized fetch history (the c93 md5 discipline): pages die —
    * 404/410/parked — and a frontier that keeps rescheduling them burns
    * budget forever (c83 bounds TRANSIENT retries; this is the
    * complementary PERMANENT-death decision). Per URL, the terminal
    * failure streak decides: trailing ≥ `DeadStreak` failures →
    * tombstoned (dropped from the frontier, tombstone epoch = last
    * success + 1), ≥ 2 → at-risk (next fetch decides), else alive. A
    * planted death cohort (doc_id % 17 == 0 fails from epoch 4 on) must
    * land entirely in the tombstoned class over the 15% transient-noise
    * floor. Rolled up per host: counts per class, dead mass in integer
    * bp, earliest tombstone epoch — the "this host is rotting" signal
    * c86's parked-host detector reads at host granularity.
    *
    * Scale: ids-only scan → synthesized (url, epoch) attempts → ONE
    * map-side-combined per-URL agg (no window: the trailing streak is
    * FcEpochs − last-success epoch) → per-host rollup.
    */
  val DeadStreak = 4
  def urlMortality(spark: SparkSession, dir: String): DataFrame = {
    val attempts = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source").as("host"))
      .withColumn("e", explode(sequence(lit(1L), lit(FcEpochs.toLong))))
      .withColumn("h",
        conv(substring(md5(concat(lit("mort:"), col("doc_id"), lit(":"),
          col("e").cast("string"))), 1, 6), 16, 10).cast("long") % 100L)
      .withColumn("ok",
        when(pmod(col("doc_id"), lit(17L)) === 0L && col("e") >= 4L, 0L)
          .when(col("h") < 15L, 0L)
          .otherwise(1L))
    val perUrl = attempts.groupBy("doc_id", "host")
      .agg(coalesce(max(when(col("ok") === 1L, col("e"))), lit(0L))
        .as("last_ok"))
      .withColumn("trailing_fail", lit(FcEpochs.toLong) - col("last_ok"))
      .withColumn("state",
        when(col("trailing_fail") >= DeadStreak.toLong, lit("tombstoned"))
          .when(col("trailing_fail") >= 2L, lit("at_risk"))
          .otherwise(lit("alive")))
    perUrl.groupBy("host")
      .agg(count(lit(1)).as("n_urls"),
        sum(when(col("state") === "tombstoned", 1L).otherwise(0L))
          .as("n_tombstoned"),
        sum(when(col("state") === "at_risk", 1L).otherwise(0L))
          .as("n_at_risk"),
        min(when(col("state") === "tombstoned", col("last_ok") + 1L))
          .as("earliest_tombstone_epoch"))
      .select(col("host"), col("n_urls"), col("n_tombstoned"),
        col("n_at_risk"),
        expr("(10000 * n_tombstoned) div n_urls").as("dead_bp"),
        coalesce(col("earliest_tombstone_epoch"), lit(-1L))
          .as("earliest_tombstone_epoch"))
      .orderBy("host")
  }

  /** c96 — CHANGE-RATE ESTIMATION + revisit-interval policy (Cho &
    * Garcia-Molina, TOIT'03 "Effective page refresh policies"): pages
    * change as Poisson processes with per-page rate λ; a crawler that
    * only OBSERVES change/no-change per visit estimates λ̂ = −ln(1−k/n)
    * (k of n visits showed a change — naive k/n underestimates because
    * multiple changes between visits collapse into one observation),
    * and the freshness-optimal revisit interval scales as 1/λ. Per
    * host, over the md5-synthesized visit history (three planted
    * change-rate tiers keyed off the host hash): pooled change counts
    * (BIGINT), change share in bp, λ̂ per epoch and the implied revisit
    * interval as the two rounded doubles, and an integer-thresholded
    * hot/warm/cold band — the direct input to c25's recrawl scheduling
    * and c34's budget split. The k = n corner (every visit changed) is
    * deterministically capped one observation short so λ̂ stays finite.
    *
    * Scale: ids-only scan → synthesized visits → ONE map-side-combined
    * host agg; no window, no join.
    */
  def changeRatePolicy(spark: SparkSession, dir: String): DataFrame = {
    val visits = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source").as("host"))
      .withColumn("tier",
        conv(substring(md5(concat(lit("rvh:"), col("host"))), 1, 6),
          16, 10).cast("long") % 3L)
      .withColumn("e", explode(sequence(lit(1L), lit(FcEpochs.toLong))))
      .withColumn("h",
        conv(substring(md5(concat(lit("rv:"), col("doc_id"), lit(":"),
          col("e").cast("string"))), 1, 6), 16, 10).cast("long") % 100L)
      .withColumn("changed",
        when(col("h") < when(col("tier") === 0L, 5L)
          .when(col("tier") === 1L, 25L).otherwise(60L), 1L)
          .otherwise(0L))
    val per = visits.groupBy("host")
      .agg((count(lit(1)) / lit(FcEpochs.toLong)).cast("long").as("n_urls"),
        count(lit(1)).as("n_visits"),
        sum("changed").as("k_sum"))
      .withColumn("k_capped", least(col("k_sum"), col("n_visits") - 1L))
      .withColumn("x",
        col("k_capped").cast("double") / col("n_visits").cast("double"))
    per.select(col("host"), col("n_urls"), col("n_visits"), col("k_sum"),
        expr("(10000 * k_sum) div n_visits").as("change_bp"),
        round(-log(lit(1.0) - col("x")), 4).as("lambda_per_epoch"),
        round(lit(1.0) / -log(lit(1.0) - col("x")), 4)
          .as("revisit_epochs"),
        when(expr("(10000 * k_sum) div n_visits") >= 4000L, lit("hot"))
          .when(expr("(10000 * k_sum) div n_visits") >= 1500L, lit("warm"))
          .otherwise(lit("cold")).as("band"))
      .orderBy("host")
  }
}
