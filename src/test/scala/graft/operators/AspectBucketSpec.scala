package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** t33 goldens (aspect-ratio bucket packing). The value equality is
  * DuckDB-oracled (rows+schema+hash); pinned here: the batch-shape
  * invariants training relies on (every full batch holds exactly B rows
  * with slots 0..B-1; the only non-full batch in a bucket is its tail),
  * plant non-vacuity (several buckets in use, a ragged tail exists),
  * and the scale shape — assignment + both windows cost ONE hash
  * exchange on bucket_ar.
  */
class AspectBucketSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  test("batch-shape invariants: full batches exact, tail ragged, slots dense") {
    val rows = ImageOps.aspectBucketReport(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(4), r.getInt(5),
        r.getBoolean(6)))
    assert(rows.nonEmpty)
    val byBucket = rows.groupBy(_._2)
    assert(byBucket.size >= 3, s"only ${byBucket.size} buckets in use — dims plant too uniform")
    var sawTail = false
    byBucket.foreach { case (b, rs) =>
      val byBatch = rs.groupBy(_._3)
      val maxBatch = byBatch.keys.max
      byBatch.foreach { case (batch, brs) =>
        val slots = brs.map(_._4).sorted.toSeq
        if (brs.head._5) {
          assert(brs.length == 8 && slots == (0 until 8),
            s"full batch ($b, $batch) malformed: $slots")
        } else {
          assert(batch == maxBatch, s"non-full batch ($b, $batch) is not the tail")
          assert(brs.length < 8 && slots == (0 until brs.length),
            s"tail batch ($b, $batch) slots not dense: $slots")
          sawTail = true
        }
      }
    }
    assert(sawTail, "no ragged tail anywhere — invariant untested")
  }

  test("one hash exchange on bucket_ar serves assignment and both windows") {
    val p = ImageOps.aspectBucketPack(
      ImageOps.aspectBucketCorpus(spark, dir))
      .queryExecution.executedPlan.toString
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected exactly one hash exchange, got $hashEx:\n$p")
    assert(p.contains("hashpartitioning(bucket_ar"),
      s"the exchange must be keyed on bucket_ar:\n$p")
  }
}
