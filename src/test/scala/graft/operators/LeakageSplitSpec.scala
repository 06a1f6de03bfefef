package graft.operators

import graft.SparkTestBase.spark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** t16 goldens: content-hash splitting must co-locate exact duplicates,
  * the leakage audit must be exactly the t05 pair set with split labels,
  * the plant must produce real crossing pairs, and the train-side action
  * must remove exactly the leaking train docs.
  */
class LeakageSplitSpec extends AnyFunSuite {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("exact duplicates land in the same split by construction") {
    val df = Seq((1L, "the same text twice"), (2L, "the same text twice"),
      (3L, "and a different one")).toDF("doc_id", "text")
    val got = TextOps.splitAssign(df).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == got(2L), "identical content split apart")
  }

  test("audit rows == t05 pairs with split labels; leaks flag correct; plant fires") {
    val pairs = TextOps.nearDupNgramJaccard(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val splits = TextOps.splitAssign(TextOps.plantedCorpus(spark, dir))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rep = TextOps.splitLeakageReport(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getString(2), r.getString(3), r.getBoolean(4))))
    assert(rep.map(_._1).toSet == pairs, "audit pair set != t05 pair set")
    assert(rep.length == pairs.size, "duplicate audit rows")
    rep.foreach { case ((a, b), (sa, sb, leaks)) =>
      assert(sa == splits(a) && sb == splits(b), s"split label wrong for ($a,$b)")
      assert(leaks == (sa != sb), s"leaks flag wrong for ($a,$b)")
    }
    assert(rep.count(_._2._3) > 0, "no crossing pair — the plant is vacuous")
    assert(rep.exists(!_._2._3), "every pair crosses — the co-location is vacuous")
  }

  test("leak-free train action drops exactly the leaking train-side docs") {
    val rep = TextOps.splitLeakageReport(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getString(2), r.getString(3), r.getBoolean(4))))
    val wantDropped = rep.filter(_._2._3).flatMap { case ((a, b), (sa, sb, _)) =>
      Seq(a -> sa, b -> sb)
    }.filter(_._2 == "train").map(_._1).toSet
    val train = TextOps.splitAssign(TextOps.plantedCorpus(spark, dir))
      .where(col("split") === "train").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val kept = TextOps.leakFreeTrainCorpus(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(kept == train -- wantDropped)
    assert(wantDropped.nonEmpty && kept.nonEmpty)
  }
}
