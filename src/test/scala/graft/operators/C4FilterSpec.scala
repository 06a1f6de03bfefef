package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** t32 goldens (C4 cleaning pass, Raffel et al. JMLR'20 §2.2). Pinned:
  * every emitted column equals a single-threaded mirror that replants
  * the line-structured corpus and applies the line/document rules
  * per row; the plant accounting (javascript line dropped on 7s,
  * lorem-ipsum page dropped on 11s, code page dropped on 13s) is exact;
  * and the whole pass is one projection — the only exchange in the plan
  * is the final presentation sort.
  */
class C4FilterSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  private def buildLines(id: Long, text: String): Seq[String] = {
    val w = text.split(" ", -1)
    def seg(from: Int, n: Int): String =
      w.slice(from - 1, from - 1 + n).mkString(" ")
    Seq(
      seg(1, 8) + ".",
      seg(1, 3),
      if (id % 7 == 0) seg(4, 9) + " javascript needed?" else seg(4, 9) + "?",
      seg(2, 8) + "!",
      if (id % 11 == 0) "lorem ipsum dolor sit amet."
      else if (id % 13 == 0) "var f = function() { return; }"
      else seg(3, 8) + " extra words here too.")
  }

  private def lineKept(l: String): Boolean =
    l.nonEmpty && ".!?\"".contains(l.last) &&
      l.trim.split("\\s+").length >= 5 && !l.contains("javascript")

  private def mirror(): Map[Long, (Long, Long, String, Int)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val id = r.getLong(0)
        val lines = buildLines(id, r.getString(1))
        val txt = lines.mkString("\n")
        val kl = lines.filter(lineKept)
        val kept = if (kl.size >= 3 && !txt.contains("lorem ipsum") &&
          !txt.contains("{")) 1 else 0
        id -> ((lines.size.toLong, kl.size.toLong, kl.mkString(" | "), kept))
      }.toMap

  test("t32 report == single-threaded mirror exactly") {
    val got = TextOps.c4Report(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getInt(4))))
      .toMap
    assert(got == mirror())
  }

  test("plant accounting: 7s lose the javascript line, 11s/13s pages dropped") {
    val got = TextOps.c4Report(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(4)))
    assert(got.nonEmpty)
    got.foreach { case (id, nKept, kept) =>
      if (id % 11 == 0 || (id % 13 == 0 && id % 11 != 0))
        assert(kept == 0, s"plant page $id survived the document rule")
      else assert(kept == 1, s"clean page $id was dropped")
      // the fragment line (3 words, no punct) always drops; the
      // javascript taint additionally drops l3 on multiples of 7; the
      // code plant fails the terminal-punct line rule too (the lorem
      // line does NOT — it reads like prose, only the document rule
      // catches it, which is exactly why C4 has both levels)
      val expectKept = 4L - (if (id % 7 == 0) 1L else 0L) -
        (if (id % 13 == 0 && id % 11 != 0) 1L else 0L)
      assert(nKept == expectKept, s"line accounting of $id")
    }
  }

  test("one projection: the only exchange is the presentation sort") {
    val plan = TextOps.c4Report(spark, dir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"unexpected exchange in t32 plan:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      "t32 must not hash-shuffle — the pass is per-row")
  }
}
