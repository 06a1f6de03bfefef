package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** t18 goldens: the exchange-free repetition metrics must equal a
  * single-threaded mirror exactly, and the keep decision must separate
  * the planted spam from the natural corpus with zero overlap.
  */
class RepetitionSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def metrics(text: String): (Long, Double, Double, Double) = {
    val t = text.trim.split("\\s+")
    val n = t.length
    def top(k: Int): Long =
      if (n < k) 0L
      else (0 to n - k).map(i => t.slice(i, i + k).mkString(" "))
        .groupBy(identity).values.map(_.size).max.toLong
    (n.toLong,
      round4(1.0 - t.distinct.length.toDouble / n),
      round4(top(2).toDouble / math.max(n - 1, 1)),
      round4(top(3).toDouble / math.max(n - 2, 1)))
  }

  private def mirror(): Map[Long, (Long, Double, Double, Double)] = {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val spam = base.filter(_._1 % 25 == 0).map { case (id, _) =>
      val text = if (id % 50 == 0) ("spam " * 60).trim
                 else ("click here now " * 30).trim
      (id + 2000000L, text)
    }
    (base ++ spam).map { case (id, t) => id -> metrics(t) }.toMap
  }

  test("t18 metrics == single-threaded mirror exactly") {
    val got = TextOps.repetitionStatsOf(TextOps.repetitionCorpus(spark, dir))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got == mirror())
  }

  test("keep decision separates planted spam from the natural corpus") {
    val rows = TextOps.repetitionReport(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(5)))
    val (planted, natural) = rows.partition(_._1 >= 2000000L)
    assert(planted.nonEmpty, "no spam planted — fixture vacuous")
    assert(planted.forall(_._2 == 0), "a planted spam doc survived the filter")
    assert(natural.forall(_._2 == 1), "a natural doc was dropped")
  }

  test("metrics job plans with zero exchanges (grams never leave the row)") {
    val plan = TextOps.repetitionStatsOf(
      spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in t18 stats:\n$plan")
  }
}
