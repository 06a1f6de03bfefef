package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** c76 goldens (image-caption alignment gate). Pinned: the distributed
  * gate equals a single-threaded two-tower mirror bit-for-bit; every true
  * caption passes and every planted mismatch (swapped caption, boilerplate
  * caption) fails, with a real margin on both sides of tau; the towers are
  * total on garbage (zero-vector cosine convention 0.0, not NaN); and the
  * gate's physical plan has ZERO exchanges — alignment is a per-row
  * verdict and must run at scan speed.
  */
class AlignmentSpec extends AnyFunSuite {
  private val n = 96
  private lazy val corpus = AlignOps.alignCorpus(spark, n)
  private lazy val gate = AlignOps.alignmentGate(corpus)
  private lazy val got = gate.collect()
    .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))

  private def cls(pid: String): String = {
    val i = pid.drop(5).toInt
    if (i % 6 == 0) "swap" else if (i % 9 == 0) "junk" else "true"
  }

  test("gate == single-threaded two-tower mirror") {
    val mirror = corpus.select("pair_id", "image_id", "bytes", "caption")
      .collect()
      .map { r =>
        val c = AlignOps.cosine(
          AlignOps.imageEmbed(r.getAs[Array[Byte]]("bytes")),
          AlignOps.textEmbed(r.getString(3)))
        val rc = math.rint(c * 10000) / 10000
        (r.getString(0), r.getString(1), rc, rc >= 0.65)
      }.toSet
    assert(got.toSet == mirror)
  }

  test("plants separate: true captions pass, swaps and junk fail, with margin") {
    val byClass = got.groupBy(t => cls(t._1))
    assert(byClass("true").forall(_._4), "a true caption was rejected")
    assert(byClass("swap").forall(!_._4), "a swapped caption passed the gate")
    assert(byClass("junk").forall(!_._4), "a boilerplate caption passed the gate")
    val trueMin = byClass("true").map(_._3).min
    val plantMax = (byClass("swap") ++ byClass("junk")).map(_._3).max
    assert(trueMin - 0.65 >= 0.15 && 0.65 - plantMax >= 0.15,
      f"threshold margin collapsed: true min $trueMin%.3f, plant max $plantMax%.3f")
  }

  test("towers are total on garbage; zero-vector cosine is 0.0") {
    val junkBytes = Array[Byte](1, 2, 3, 4, 5)
    assert(AlignOps.imageEmbed(junkBytes).forall(_ == 0f))
    assert(AlignOps.cosine(AlignOps.imageEmbed(junkBytes),
      AlignOps.textEmbed("anything at all")) == 0.0)
    assert(AlignOps.textEmbed("").forall(_ == 0f) ||
      AlignOps.cosine(AlignOps.textEmbed(""), AlignOps.textEmbed("")) == 0.0)
  }

  test("plan pin: the gate is exchange-free (per-row verdict, scan speed)") {
    val plan = gate.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"alignment gate plan grew an exchange:\n$plan")
  }
}
