package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** t37 goldens (Gopher quality rules, Rae et al. 2021 §A1.1). Pinned:
  * every emitted column equals a single-threaded mirror that replants
  * the violation corpus and recomputes the five rule metrics per row;
  * each modulus plant trips exactly its wired rule; and the pass is one
  * projection — the only exchange in the plan is the presentation sort.
  */
class GopherSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private val stop = Set("the", "a", "data", "table", "join", "row", "scan", "merge")

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def plant(id: Long, text: String): String =
    if (id % 17 == 0) text.split(" ", -1).take(5).mkString(" ")
    else if (id % 19 == 0) text + " ## ## ## ## ## ## ## ## ## ## ## ##"
    else if (id % 23 == 0) text.replaceAll("[A-Za-z]", "7")
    else if (id % 29 == 0) text + " " + Array.fill(20)("x" * 40).mkString(" ")
    else text

  private def metrics(text: String): (Long, Double, Double, Double, Long, Int) = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    val n = math.max(toks.length, 1)
    val mean = r4(toks.map(_.length).sum.toDouble / n)
    val hashes = text.count(_ == '#')
    val ellipses = (text.length - text.replaceAll("\\.\\.\\.", "").length) / 3
    val sym = r4((hashes + ellipses).toDouble / n)
    val alpha = r4(toks.count(_.exists(_.isLetter)).toDouble / n)
    val nStop = toks.distinct.count(stop.contains).toLong
    val kept = if (toks.length >= 20 && toks.length <= 100000 &&
      mean >= 3.0 && mean <= 10.0 && sym <= 0.1 && alpha >= 0.8 &&
      nStop >= 2) 1 else 0
    (toks.length.toLong, mean, sym, alpha, nStop, kept)
  }

  private def mirror(): Map[Long, (Long, Double, Double, Double, Long, Int)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> metrics(plant(r.getLong(0), r.getString(1))))
      .toMap

  test("t37 report == single-threaded mirror exactly") {
    val got = TextOps.gopherReport(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getInt(6))))
      .toMap
    assert(got == mirror())
  }

  test("plant accounting: each modulus trips its wired rule") {
    val got = TextOps.gopherReport(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getInt(6)))
    assert(got.nonEmpty)
    var keptClean = 0
    got.foreach { case (id, nWords, mean, sym, alpha, nStop, kept) =>
      if (id % 17 == 0) {
        assert(nWords <= 5 && kept == 0, s"word-count plant $id survived")
      } else if (id % 19 == 0) {
        assert(sym > 0.1 && kept == 0, s"symbol plant $id survived")
      } else if (id % 23 == 0) {
        assert(alpha < 0.8 && nStop == 0 && kept == 0,
          s"alpha plant $id survived")
      } else if (id % 29 == 0) {
        assert(mean > 10.0 && kept == 0, s"word-length plant $id survived")
      } else if (kept == 1) keptClean += 1
      // verdict is always consistent with the emitted metrics
      val expect = if (nWords >= 20 && nWords <= 100000 && mean >= 3.0 &&
        mean <= 10.0 && sym <= 0.1 && alpha >= 0.8 && nStop >= 2) 1 else 0
      assert(kept == expect, s"verdict of $id inconsistent with metrics")
    }
    assert(keptClean > 0, "no clean doc passed the Gopher rules")
  }

  test("one projection: the only exchange is the presentation sort") {
    val plan = TextOps.gopherReport(spark, dir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"unexpected exchange in t37 plan:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      "t37 must not hash-shuffle — the pass is per-row")
  }
}
