package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** t36 goldens (soft dedup / count-aware weights) — the hard gate is the
  * DuckDB oracle; pinned here: the conservation law (weights sum to the
  * ORIGINAL corpus size — soft dedup must not lose mass), survivor
  * weights equal their t07 component sizes exactly, every planted
  * revision's survivor carries weight >= 2, and the kept id set equals
  * t08's hard-dedup corpus (same survivors, only the weight differs).
  */
class WeightedDedupSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  test("conservation, component sizes, planted weights, t08 agreement") {
    val weighted = DedupResolve.weightedCorpus(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val nCorpus = TextOps.plantedCorpus(spark, dir).count()
    assert(weighted.map(_._2).sum == nCorpus, "weights must sum to corpus size")
    val labels = DedupResolve.resolveNgramDups(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val compSize = labels.groupBy(_._2).map { case (c, v) => c -> v.length.toLong }
    val byId = weighted.toMap
    labels.filter(_._3).foreach { case (id, c, _) =>
      assert(byId(id) == compSize(c), s"survivor $id weight != component size")
      assert(byId(id) >= 2L, s"paired survivor $id must carry multiplicity")
    }
    labels.filterNot(_._3).foreach { case (id, _, _) =>
      assert(!byId.contains(id), s"non-survivor $id must be dropped")
    }
    val hard = DedupResolve.dedupedCorpus(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(weighted.map(_._1).toSet == hard,
      "soft dedup must keep exactly t08's survivor set")
  }
}
