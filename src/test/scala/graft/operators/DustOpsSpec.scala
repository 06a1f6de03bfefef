package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** c28 goldens: the distributed DUST rule miner must equal a
  * single-threaded mirror, the planted content-preserving params (sid,
  * ref) must be learned irrelevant on every host with support, the
  * content-CHANGING param (v) must never be, and the frontier rewrite
  * must collapse exactly the learned aliases.
  */
class DustOpsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** (host, url, content_hash) mirror of DustOps.syntheticUrlLog. */
  private def localLog(): Seq[(String, String, String)] = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.flatMap { case (id, src) =>
      val base = s"http://$src/item${id % 7}/a$id"
      val same = md5hex(s"c:$id")
      Seq((src, base, same)) ++
        (if (id % 3 == 0) Seq((src, s"$base?sid=${md5hex(s"x:$id")}", same)) else Nil) ++
        (if (id % 5 == 0) Seq((src, s"$base?ref=${md5hex(s"y:$id")}", same)) else Nil) ++
        (if (id % 4 == 1) Seq((src, s"$base?v=2", md5hex(s"d:$id"))) else Nil)
    }.toSeq
  }

  /** Sequential rule miner mirroring DustOps.aliasRules. */
  private def mirrorRules(log: Seq[(String, String, String)],
                          minSupport: Int = 2): Map[(String, String), (Long, Long, Long, Boolean)] = {
    val bare = log.filter(!_._2.contains("?"))
      .map { case (h, u, c) => (h, u) -> c }.toMap
    log.filter(_._2.contains("?"))
      .flatMap { case (h, u, c) =>
        val base = u.split("\\?")(0)
        val param = u.split("\\?")(1).split("=")(0)
        bare.get((h, base)).map(bc => ((h, param), c == bc))
      }
      .groupBy(_._1)
      .map { case (k, vs) =>
        val nPairs = vs.size.toLong
        val nSame = vs.count(_._2).toLong
        k -> (nPairs, nSame, nPairs - nSame, nSame >= minSupport && nPairs == nSame)
      }
  }

  private def sparkRules(): Map[(String, String), (Long, Long, Long, Boolean)] =
    DustOps.dustReport(spark, dir).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
    }.toMap

  test("c28 rule miner == single-threaded mirror exactly") {
    assert(sparkRules() == mirrorRules(localLog()))
  }

  test("content-preserving params learned; content-changing param never") {
    val rules = sparkRules()
    val byParam = rules.groupBy(_._1._2)
    assert(byParam.contains("sid") && byParam.contains("v"), "plants missing")
    // sid/ref agree everywhere — irrelevant wherever support >= 2
    for (p <- Seq("sid", "ref"); ((_, _), (nPairs, nSame, nDiff, irr)) <- byParam(p)) {
      assert(nDiff == 0L, s"$p pair disagreed")
      assert(irr == (nSame >= 2L))
    }
    // v changes content — never learned, on any host
    assert(byParam("v").values.forall(!_._4), "content-changing param learned")
    assert(byParam("v").values.forall(_._3 > 0L), "v plant produced no refutation")
  }

  test("incremental delta-join store == one-shot batch miner (3 adversarial slices)") {
    import spark.implicits._
    val root = graft.SparkTestBase.tempDir("graft-dust-inc")
    val rows = localLog()
    def slice(u: String): Int = math.floorMod(u.hashCode, 3)
    (0 until 3).foreach { k =>
      DustOps.writeDustEpoch(
        rows.filter(r => slice(r._2) == k).toDF("host", "url", "content_hash"),
        root, k)
    }
    // the slicing actually separates some alias from its bare URL — the
    // cross-batch pairing path is exercised, not vacuous
    val crossBatch = rows.filter(_._2.contains("?")).exists { case (_, u, _) =>
      slice(u) != slice(u.split("\\?")(0))
    }
    assert(crossBatch, "all aliases landed with their bare URL — slicing vacuous")
    val inc = DustOps.dustRulesFrom(spark, root, uptoEpoch = 2).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
    }.toMap
    assert(inc == sparkRules(), "incremental rules diverged from batch miner")
  }

  test("streaming demo (c31) == batch rules") {
    val streamed = graft.streaming.StreamingJobs.dustMineDemo(spark, dir)
      .collect().map { r =>
        (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
      }.toMap
    assert(streamed == sparkRules(), "streamed rules diverged from batch miner")
  }

  test("frontier rewrite collapses exactly the learned aliases") {
    import spark.implicits._
    val log = localLog()
    val rules = DustOps.dustReport(spark, dir)
    val frontier = log.map { case (h, u, _) => (h, u) }.toDF("host", "url")
    val got = DustOps.rewriteFrontier(frontier, rules)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    // NOTE: .filter/.keySet, not .collect-to-pairs — collect on a Map
    // producing tuples rebuilds a Map and silently drops all but one
    // learned param per host
    val learned = mirrorRules(log).filter(_._2._4).keySet
    val want = log.map { case (h, u, _) =>
      val param = if (u.contains("?")) u.split("\\?")(1).split("=")(0) else ""
      if (learned((h, param))) (h, u.split("\\?")(0)) else (h, u)
    }.sorted
    assert(got == want)
    // the rewrite actually collapsed something (post-rewrite distinct <
    // pre-rewrite distinct)
    assert(got.distinct.size < log.map(l => (l._1, l._2)).distinct.size)
  }
}
