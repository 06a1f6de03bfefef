package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** c35 goldens: rendezvous assignment must equal a single-threaded
  * mirror exactly, and the resize S -> S+1 must exhibit the rendezvous
  * guarantees — every moved host lands on the NEW shard, roughly 1/(S+1)
  * of hosts move, and load stays balanced.
  */
class ShardSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def winner(host: String, n: Int): Int =
    (0 until n).minBy(s => md5hex(s"$host|$s"))

  private def hosts(): Seq[String] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect()
      .map(r => s"host${r.getLong(0) % 997}").distinct.toSeq

  test("c35 assignment == single-threaded rendezvous mirror exactly") {
    val got = ShardOps.shardReport(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getInt(2), r.getInt(3)))
      .toMap
    val want = hosts().map { h =>
      val (a, b) = (winner(h, 8), winner(h, 9))
      h -> (a, b, if (a != b) 1 else 0)
    }.toMap
    assert(got == want)
  }

  test("every moved host lands on the new shard; ~1/(S+1) move") {
    val rows = ShardOps.shardReport(spark, dir).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3)))
    val moved = rows.filter(_._3 == 1)
    assert(moved.nonEmpty, "no host moved — resize fixture vacuous")
    assert(moved.forall(_._2 == 8),
      "a host moved between two OLD shards — rendezvous guarantee broken")
    val frac = moved.length.toDouble / rows.length
    assert(frac > 0.04 && frac < 0.25,
      s"movement fraction $frac far from the expected ~1/9")
  }

  test("shard load is balanced (max <= 2x mean at 8 shards)") {
    val byShard = ShardOps.shardReport(spark, dir).collect()
      .groupBy(_.getInt(1)).view.mapValues(_.length)
    val mean = byShard.values.sum.toDouble / 8
    assert(byShard.values.max <= 2 * mean,
      s"skewed shard loads: $byShard")
  }
}
