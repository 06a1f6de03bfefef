package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** t21 goldens. The parquet corpus's vocabulary is language-independent
  * (so t21 on it is gated by the DuckDB oracle alone); the SEMANTICS —
  * target-like documents outrank the rest — are pinned here on a
  * constructed corpus with distinct vocabularies.
  */
class DsirSpec extends AnyFunSuite {
  import spark.implicits._

  // 20 target-lang docs (vocab A), 30 raw docs: 10 impostors written in
  // vocab A (should be selected) + 20 in vocab B (should not).
  private def corpus() = {
    def textOf(vocab: String, i: Long): String =
      (0 until 30).map(k => s"$vocab${(i * 7 + k) % 12}").mkString(" ")
    val target = (0L until 20L).map(i => (i, "en", textOf("alpha", i)))
    val impostor = (100L until 110L).map(i => (i, "xx", textOf("alpha", i)))
    val offTarget = (200L until 220L).map(i => (i, "xx", textOf("beta", i)))
    spark.createDataset(target ++ impostor ++ offTarget)
      .toDF("doc_id", "lang", "text")
  }

  test("target-vocabulary docs outrank off-target docs; quota exact") {
    val rows = TextOps.dsirWeightsOf(corpus(), "en").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.length == 50)
    assert(rows.count(_._3 == 1) == 50 / 4, "selection quota != floor(n/4)")
    val byId = rows.map(r => r._1 -> r._2).toMap
    val minAlpha = (0L until 20L).map(byId) ++ (100L until 110L).map(byId)
    val maxBeta = (200L until 220L).map(byId)
    assert(minAlpha.min > maxBeta.max,
      "an off-target (vocab B) doc outweighed a target-vocab doc")
    // every selected doc is vocab-A (target or impostor) — the DSIR point:
    // selection is by DISTRIBUTION, not by the lang label
    val selected = rows.filter(_._3 == 1).map(_._1).toSet
    assert(selected.forall(id => id < 20L || (id >= 100L && id < 110L)))
    assert(selected.exists(id => id >= 100L && id < 110L),
      "no impostor selected — the distribution-over-label property is vacuous")
  }

  test("weights are parallelism-invariant (integer arithmetic end to end)") {
    val a = TextOps.dsirWeightsOf(corpus().repartition(1), "en").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val b = TextOps.dsirWeightsOf(corpus().repartition(8), "en").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(a == b)
  }
}
