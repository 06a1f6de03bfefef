package graft.operators

import graft.SparkTestBase.{spark, tempDir}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form SEMANTIC properties of the statistical operators — the
  * DuckDB hash gate proves cross-engine parity, not correctness of the
  * statistic itself; these fixtures pin the textbook cases (perfect
  * separation, perfect trend, zero variance, saturating/idle queues,
  * known tail index) where the right answer is derivable by hand.
  */
class StatPropertiesSpec extends AnyFunSuite {
  import spark.implicits._

  /** events table: type 'a' = 1..20, type 'b' = 101..120 — complete
    * separation, no ties anywhere.
    */
  private lazy val sepDir: String = {
    val d = tempDir("stat-sep")
    val rows =
      (1 to 20).map(i => ("a", i.toDouble)) ++
        (1 to 20).map(i => ("b", 100.0 + i))
    rows.toDF("event_type", "value")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("event_id", monotonically_increasing_id())
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  /** events table: type 'r' has i events on day i (strict rise), type
    * 'c' has a constant 5 events/day.
    */
  private lazy val trendDir: String = {
    val d = tempDir("stat-trend")
    val rows =
      (1 to 12).flatMap(i => Seq.fill(i)(
        ("r", f"2024-01-$i%02d 12:00:00"))) ++
        (1 to 10).flatMap(i => Seq.fill(5)(
          ("c", f"2024-01-$i%02d 12:00:00")))
    rows.toDF("event_type", "t")
      .withColumn("ts", to_timestamp(col("t")))
      .withColumn("value", lit(1.0))
      .withColumn("event_id", monotonically_increasing_id())
      .drop("t")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  /** documents table: one language, lengths drawn from an exact Pareto
    * quantile grid x_i = round(100 / (i/n)^(1/2)) — tail index 2.
    */
  private lazy val paretoDir: String = {
    val d = tempDir("stat-pareto")
    val n = 200
    (1 to n).map { i =>
      val x = math.round(100.0 / math.sqrt(i.toDouble / n))
      (i.toLong, "xx", s"h${i % 4}", x)
    }.toDF("doc_id", "lang", "source", "n_chars")
      .withColumn("text", lit("t"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q79 mann-whitney: complete separation gives U = 0 and AUC = 0 for the lower side") {
    val r = Relational.mannWhitneyEvents(spark, sepDir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("type_a") == "a")
    assert(row.getAs[Long]("u2_a") == 0L, "a below b must give U_a = 0")
    assert(row.getAs[Long]("auc_bp") == 0L)
    // z for U = 0 at n_a = n_b = 20, no ties: far below -1.96
    assert(row.getAs[Double]("z") < -5.0)
  }

  test("q80 ks: complete separation gives D = 1 (ks_num = n_a*n_b)") {
    val r = Relational.ksEvents(spark, sepDir).collect().head
    assert(r.getAs[Long]("ks_num") == 400L)
    assert(r.getAs[Double]("d") == 1.0)
  }

  test("q83 mann-kendall: strictly rising daily counts give S = C(n,2) and verdict rising") {
    val r = Relational.mannKendallTrend(spark, trendDir)
      .where(col("event_type") === "r").collect().head
    assert(r.getAs[Long]("n_days") == 12L)
    assert(r.getAs[Long]("s") == 66L, "all 66 day pairs must be concordant")
    assert(r.getAs[String]("verdict") == "rising")
  }

  test("q89 dispersion: a constant series has T = 0 and reads underdispersed") {
    val r = Relational.dispersionTest(spark, trendDir)
      .where(col("event_type") === "c").collect().head
    assert(r.getAs[Long]("num") == 0L, "zero variance must clear the numerator")
    assert(r.getAs[String]("verdict") == "underdispersed")
  }

  test("q85 runs test: a strictly rising series has exactly 2 runs (maximal clustering)") {
    val r = Relational.runsTest(spark, trendDir)
      .where(col("event_type") === "r").collect().head
    // below-median days all precede above-median days -> 2 runs
    assert(r.getAs[Long]("n_runs") == 2L)
    assert(r.getAs[String]("verdict") == "clustered")
  }

  test("c98 lindley: an infinite cap never queues; a zero cap diverges monotonically") {
    val idle = BandwidthOps.backlogLindley(spark, paretoDir,
      capBytes = 1000000000L).collect()
    assert(idle.nonEmpty)
    assert(idle.forall(_.getAs[String]("verdict") == "never_queued"))
    val jam = BandwidthOps.backlogLindley(spark, paretoDir, capBytes = 0L)
      .collect()
    assert(jam.forall(_.getAs[String]("verdict") == "diverging"))
    jam.foreach { r =>
      assert(r.getAs[Long]("final_backlog") == r.getAs[Long]("total_demand"),
        "with zero service the backlog is the whole demand")
    }
  }

  test("t54 hill: an exact Pareto(alpha=2) quantile grid recovers alpha within the coarse band") {
    val r = TextOps.tailIndex(spark, paretoDir).collect().head
    assert(r.getAs[Long]("k") == 10L)
    val alpha = r.getAs[Double]("hill_alpha")
    assert(alpha > 1.0 && alpha < 4.0,
      s"hill alpha $alpha outside the plausible band for true alpha = 2")
  }
}
