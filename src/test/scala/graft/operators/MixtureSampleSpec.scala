package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** t15 goldens: the distributed temperature-mixture sampler must equal a
  * single-threaded mirror exactly (sqrt weights, 9 dp rate rounding,
  * md5-hex threshold acceptance), be parallelism-invariant, and actually
  * flatten the domain distribution (over-represented sources are
  * downsampled harder).
  */
class MixtureSampleSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private val targetFrac = 0.25

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def localDocs(): Seq[(Long, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  /** Mirror of mixtureRates + mixtureSample + mixtureReport. */
  private def mirror(): (Map[String, (Long, Double, Long)], Set[Long]) = {
    val ds = localDocs()
    val counts = ds.groupBy(_._2).map { case (s, xs) => s -> xs.size.toLong }
    val nTotal = counts.values.sum
    val wTotal = counts.values.map(n => math.sqrt(n.toDouble)).sum
    val rates = counts.map { case (s, n) =>
      s -> r9(math.min(1.0,
        math.floor(nTotal * targetFrac) * math.sqrt(n.toDouble) / (wTotal * n)))
    }
    val thr = rates.map { case (s, r) =>
      s -> (if (r >= 1.0) "g"
            else {
              val v = math.floor(r * 4294967296.0).toLong
              f"$v%08x"
            })
    }
    val kept = ds.filter { case (id, s) =>
      md5hex(s"mix1:$id").substring(0, 8) < thr(s)
    }
    val keptBySource = kept.groupBy(_._2).map { case (s, xs) => s -> xs.size.toLong }
    val report = counts.map { case (s, n) =>
      s -> (n, rates(s), keptBySource.getOrElse(s, 0L))
    }
    (report, kept.map(_._1).toSet)
  }

  private def sparkReport(): Map[String, (Long, Double, Long)] =
    TextOps.mixtureReport(spark, dir, targetFrac).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap

  test("t15 report == single-threaded mirror exactly") {
    assert(sparkReport() == mirror()._1)
  }

  test("kept row set == mirror accept decisions; parallelism-invariant") {
    val want = mirror()._2
    val got = TextOps.mixtureSample(spark, dir, targetFrac)
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
    graft.SparkTestBase.withShufflePartitions(1) {
      val again = TextOps.mixtureSample(spark, dir, targetFrac)
        .collect().map(_.getLong(0)).toSet
      assert(again == want)
    }
  }

  test("temperature flattens: bigger sources get lower accept rates") {
    val rep = sparkReport()
    assert(rep.size >= 2, "need at least two sources")
    val byN = rep.values.toSeq.sortBy(_._1)
    // rate is monotone non-increasing in source size (w/n = 1/sqrt(n))
    byN.sliding(2).foreach { case Seq((n1, r1, _), (n2, r2, _)) =>
      if (n1 < n2) assert(r1 >= r2, s"rate not flattening: n=$n1 r=$r1 vs n=$n2 r=$r2")
    }
    // realized total lands near the target (binomial noise at 500 docs)
    val keptTotal = rep.values.map(_._3).sum.toDouble
    val n = rep.values.map(_._1).sum.toDouble
    assert(math.abs(keptTotal / n - targetFrac) < 0.1,
      s"kept fraction ${keptTotal / n} far from $targetFrac")
  }
}
