package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** c47 goldens (caption-divergence mining). Pinned: the divergent-cluster
  * set equals a single-threaded all-pairs + union-find mirror over the same
  * hamming threshold and caption normalization; every planted caption edit
  * is reported; clusters whose captions differ only in whitespace/case are
  * NOT reported (normalization contract).
  */
class CaptionDivergenceSpec extends AnyFunSuite {
  private val tau = 3
  private val groups = 60

  private def corpus(): Array[(String, Long, String)] =
    ImageOps.captionCorpus(spark, groups).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))

  private def normCap(s: String): String =
    s.replaceAll("\\s+", " ").trim.toLowerCase

  /** Mirror: all-pairs hamming <= tau, union-find, per-component caption
    * stats — component label = min member img_hash (DedupResolve contract).
    */
  private def mirror(rows: Array[(String, Long, String)])
      : Set[(Long, Long, Long, String, String)] = {
    val hashed = rows.map { case (id, ph, cap) =>
      (CrawlOracle.xxhash64(id), ph, normCap(cap))
    }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    for {
      a <- hashed; b <- hashed
      if a._1 < b._1 && java.lang.Long.bitCount(a._2 ^ b._2) <= tau
    } union(a._1, b._1)
    // only members that appear in some pair are clustered (singletons out)
    val inPair = hashed.filter(x => hashed.exists(y =>
      y._1 != x._1 && java.lang.Long.bitCount(x._2 ^ y._2) <= tau))
    inPair.groupBy(x => find(x._1)).flatMap { case (comp, members) =>
      val caps = members.map(_._3)
      val distinct = caps.distinct.sorted
      if (distinct.length >= 2)
        Some((comp, members.length.toLong, distinct.length.toLong,
          distinct.head, distinct.last))
      else None
    }.toSet
  }

  test("c47 divergent clusters == all-pairs union-find mirror") {
    val rows = corpus()
    val want = mirror(rows)
    val got = ImageOps.captionDivergenceDemo(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toSet
    assert(got == want)
    assert(got.nonEmpty, "fixture vacuous")
  }

  test("c47 planted edits found; normalization-noise clusters silent") {
    val rows = corpus()
    val byGroup = rows.groupBy(_._1.split("/art-")(1).split("-m")(0).toInt)
    val got = ImageOps.captionDivergenceDemo(spark).collect()
      .map(r => (r.getLong(0), r.getString(3), r.getString(4)))
    // expected divergent groups: odd g with >1 member (k = 1 + g%3 > 1)
    val editedGroups = (0 until groups).filter(g => g % 2 == 1 && g % 3 != 0)
    val quietGroups = (0 until groups).filter(g => !(g % 2 == 1 && g % 3 != 0))
    assert(editedGroups.size >= 15 && quietGroups.size >= 15, "fixture too thin")
    editedGroups.foreach { g =>
      val comp = byGroup(g).map(x => CrawlOracle.xxhash64(x._1)).min
      val hit = got.find(_._1 == comp)
      assert(hit.isDefined, s"planted edit in group $g not reported")
      assert(hit.get._2 == s"caption $g" && hit.get._3 == s"caption $g (edited)",
        s"group $g extremes wrong: ${hit.get}")
    }
    quietGroups.foreach { g =>
      val comp = byGroup(g).map(x => CrawlOracle.xxhash64(x._1)).min
      assert(!got.exists(_._1 == comp),
        s"group $g (no real edit) falsely reported divergent")
    }
  }
}
