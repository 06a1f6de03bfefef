package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** c48 goldens (version-chain retention thinning). Pinned: the retained key
  * set equals a single-threaded mirror of the policy; per-chain invariants
  * (first + latest always survive, full window fidelity, bounded thinned
  * count); applyRetention is an exact key-pair filter of the payload table.
  */
class RetentionSpec extends AnyFunSuite {
  private val atSeq = 11L
  private val keepWindow = 3L
  private val stride = 3
  private val boundary = atSeq - keepWindow + 1

  private def chains(): Map[Long, Seq[Long]] =
    RetentionOps.demoVersions(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, vs) => id -> vs.map(_._2).sorted.toSeq }

  private def mirror(): Set[(Long, Long, String)] =
    chains().flatMap { case (id, seqs) =>
      val nOld = seqs.count(_ < boundary)
      seqs.zipWithIndex.flatMap { case (seq, idx) =>
        val rk = idx + 1
        val reason =
          if (seq >= boundary) Some("window")
          else if (rk == 1) Some("first")
          else if (rk == nOld) Some("boundary")
          else if ((rk - 1) % stride == 0) Some("stride")
          else None
        reason.map(r => (id, seq, r))
      }
    }.toSet

  test("c48 retained keys == single-threaded policy mirror") {
    val got = RetentionOps.retentionDemo(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = mirror()
    assert(got == want)
    // fixture exercises every reason class
    assert(Set("window", "first", "boundary", "stride")
      .subsetOf(got.map(_._3)), s"reason classes thin: ${got.map(_._3)}")
  }

  test("c48 invariants: first+latest survive, window is full-fidelity, thinning bounded") {
    val keys = RetentionOps.retentionDemo(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cs = chains()
    assert(cs.exists { case (_, seqs) => seqs.max < boundary }, "no dead chain planted")
    cs.foreach { case (id, seqs) =>
      assert(keys.contains((id, seqs.min)), s"chain $id lost its first version")
      assert(keys.contains((id, seqs.max)), s"chain $id lost its LATEST version")
      seqs.filter(_ >= boundary).foreach { s =>
        assert(keys.contains((id, s)), s"in-window version ($id,$s) dropped")
      }
      val oldKept = seqs.filter(_ < boundary).count(s => keys.contains((id, s)))
      val nOld = seqs.count(_ < boundary)
      val bound = (if (nOld == 0) 0 else (nOld + stride - 1) / stride + 2)
      assert(oldKept <= bound, s"chain $id kept $oldKept of $nOld old (> $bound)")
    }
  }

  test("c48 applyRetention: payload table filtered to exactly the retained keys") {
    import org.apache.spark.sql.functions._
    val hist = RetentionOps.demoVersions(spark)
      .withColumn("caption", concat(lit("cap-"), col("image_id"), lit("-"), col("epoch")))
    val keys = RetentionOps.retentionKeys(hist, "image_id", "epoch",
      atSeq, keepWindow, stride)
    val kept = RetentionOps.applyRetention(hist, keys, "image_id", "epoch")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val keySet = keys.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = hist.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(kept == full.filter(r => keySet.contains((r._1, r._2))).toSet)
    assert(kept.size < full.length, "retention dropped nothing — fixture vacuous")
  }
}
