package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** c45 goldens: schedule == single-threaded mirror exactly (same md5
  * draws, same integer estimator); never-changing pages get the maximum
  * interval; the interval is monotone non-increasing in observed changes
  * (the Cho–Garcia-Molina ordering the integer form must preserve); and
  * the fixture actually spreads pages across several tiers.
  */
class RecrawlSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  private def md5hex6(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(3).map("%02x".format(_)).mkString, 16)
  }

  private def mirror(): Map[Long, (Long, Long, Long, Long)] = {
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    ids.map { id =>
      val x = (1 to RecrawlOps.ObsEpochs)
        .count(e => md5hex6(s"$id:$e") % 8 < id % 8).toLong
      val interval = math.max(1L, RecrawlOps.ObsEpochs.toLong / (x + 1))
      id -> (RecrawlOps.ObsEpochs.toLong, x, interval,
        RecrawlOps.ObsEpochs.toLong + interval)
    }.toMap
  }

  test("c45 schedule == single-threaded mirror exactly") {
    val got = RecrawlOps.recrawlSchedule(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val want = mirror()
    assert(got.keySet == want.keySet)
    got.foreach { case (id, g) => assert(g == want(id), s"page $id") }
  }

  test("semantics: static pages wait longest; interval monotone in changes; tiers spread") {
    val rows = RecrawlOps.recrawlSchedule(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // rho = 0 pages never change -> full-window interval
    val static = rows.filter(_._1 % 8 == 0)
    assert(static.nonEmpty)
    static.foreach { case (id, x, iv) =>
      assert(x == 0L && iv == RecrawlOps.ObsEpochs.toLong, s"page $id")
    }
    // monotone: same change count -> same interval; more changes -> <= interval
    val byX = rows.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
    byX.foreach { case (x, ivs) => assert(ivs.size == 1, s"x=$x gave $ivs") }
    val sortedX = byX.keys.toSeq.sorted
    sortedX.zip(sortedX.tail).foreach { case (a, b) =>
      assert(byX(a).head >= byX(b).head, s"interval rose from x=$a to x=$b")
    }
    // non-vacuous: several tiers realized, including the fastest
    assert(byX.size >= 4, s"only ${byX.size} tiers realized")
    assert(rows.exists(_._3 == 1L), "no page reached the every-epoch tier")
  }
}
