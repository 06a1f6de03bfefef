package graft.operators

import graft.SparkTestBase.{spark, withShufflePartitions}
import org.scalatest.funsuite.AnyFunSuite

/** c42 goldens: the iterative-join resolution equals a sequential walk of
  * the same successor function, chain/loop semantics pinned (the DuckDB
  * oracle gates the parquet corpus end to end).
  */
class RedirectOpsSpec extends AnyFunSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def succ(id: Long): Option[Long] =
    if (id % 5 != 0) Some(id - 1)
    else if ((id / 5) % 10 == 9) Some(id + 4)
    else None

  private def mirror(ids: Seq[Long], maxHops: Int): Map[Long, (Long, Int, Boolean)] =
    ids.map { id =>
      var cur = id; var hops = 0
      while (hops < maxHops && succ(cur).isDefined) { cur = succ(cur).get; hops += 1 }
      id -> ((cur, hops, hops >= maxHops))
    }.toMap

  private def run() =
    RedirectOps.resolveRedirects(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getBoolean(3)))).toMap

  test("resolution == sequential walk of the successor function") {
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").as[Long].collect().toSeq
    val got = run()
    assert(got == mirror(ids, 8))
  }

  test("chain/loop semantics: bases terminal, chains end at the base, cycles exceed") {
    val got = run()
    // non-loop block: 5k+j walks j hops down to 5k
    val (f12, h12, x12) = got(12L)
    assert(f12 == 10L && h12 == 2 && !x12)
    // terminal base: zero hops
    val (f10, h10, x10) = got(10L)
    assert(f10 == 10L && h10 == 0 && !x10)
    // loop block (k % 10 == 9, e.g. ids 45..49): every member exhausts the
    // hop budget — the "too many redirects" crawler verdict
    (45L to 49L).foreach { id =>
      assert(got(id)._3, s"cycle member $id not flagged exceeded")
      assert(got(id)._2 == 8)
    }
    assert(got.count(_._2._3) > 0 && got.count(!_._2._3) > 0)
  }

  test("parallelism invariance") {
    val base = run()
    assert(withShufflePartitions(3)(run()) == base)
  }
}
