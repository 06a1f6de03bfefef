package graft.operators

import graft.SparkTestBase.spark
import graft.functions.TextKit
import org.scalatest.funsuite.AnyFunSuite

/** c49 goldens (word-level caption diff scripts). Pinned: reconstruction
  * invariants and LCS minimality of the kernel over seeded fuzz pairs
  * (minimality checked against an INDEPENDENT forward-DP LCS length);
  * Spark rows == kernel applied to each changed pair; edge shapes.
  */
class CaptionDiffSpec extends AnyFunSuite {

  private def lcsLen(a: Array[String], b: Array[String]): Int = {
    // classic forward 2-row DP — written independently of wordDiff's
    // backward table so minimality is not self-certified
    var prev = new Array[Int](b.length + 1)
    var cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      for (j <- 1 to b.length) {
        cur(j) =
          if (a(i - 1) == b(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
    }
    prev(b.length)
  }

  private def checkScript(from: String, to: String): Unit = {
    val script = TextKit.wordDiff(from, to)
    val fromToks = TextKit.tokenize(from).toSeq
    val toToks = TextKit.tokenize(to).toSeq
    val spanToks = script.map { case (op, span) => (op, span.split(" ").toSeq) }
    assert(spanToks.flatMap { case (op, t) if op != "ins" => t; case _ => Nil }
      == fromToks, s"keep+del must spell FROM for <$from> -> <$to>: $script")
    assert(spanToks.flatMap { case (op, t) if op != "del" => t; case _ => Nil }
      == toToks, s"keep+ins must spell TO for <$from> -> <$to>: $script")
    val kept = spanToks.collect { case ("keep", t) => t.length }.sum
    assert(kept == lcsLen(fromToks.toArray, toToks.toArray),
      s"script not minimal for <$from> -> <$to>: $script")
    script.sliding(2).foreach {
      case Seq((o1, _), (o2, _)) =>
        assert(o1 != o2, s"unmerged adjacent spans: $script")
      case _ =>
    }
  }

  test("c49 kernel: reconstruction + minimality + maximal merge (seeded fuzz)") {
    val words = Array("mayor", "bridge", "river", "opens", "east", "fire", "a", "12")
    val rnd = new scala.util.Random(7)
    (0 until 400).foreach { _ =>
      def sent() = (0 until rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
      checkScript(sent(), sent())
    }
    // edges
    checkScript("", "")
    checkScript("", "a b c")
    checkScript("a b c", "")
    checkScript("Mayor, OPENS!", "mayor opens") // normalization: all-keep
    assert(TextKit.wordDiff("Mayor, OPENS!", "mayor opens") == Seq(("keep", "mayor opens")))
    assert(TextKit.wordDiff("x y", "p q") == Seq(("del", "x y"), ("ins", "p q")))
  }

  test("c49 spark rows == kernel over each changed pair") {
    val (cur, prev) = DiffJob.captionDiffCorpus(spark)
    val curRows = cur.collect().map(r => (r.getString(0), r.getString(1))).toMap
    val prevRows = prev.collect().map(r => (r.getString(0), r.getString(1))).toMap
    val want = prevRows.keys.toSeq.flatMap { id =>
      val (from, to) = (prevRows(id), curRows(id))
      if (from == to) Nil
      else TextKit.wordDiff(from, to).zipWithIndex.map {
        case ((op, span), k) => (id, k, op, span)
      }
    }.toSet
    val got = DiffJob.captionDiffDemo(spark).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3))).toSet
    assert(got == want)
    // every edit family appears
    assert(got.exists(_._3 == "del") && got.exists(_._3 == "ins") &&
      got.exists(_._3 == "keep"), "fixture missing an op class")
    assert(got.nonEmpty)
  }
}
