package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** t25 goldens (CCNet-style paragraph dedup). Pinned: equality with a
  * single-threaded mirror over the same constructed paragraph corpus;
  * boilerplate semantics (exactly one corpus-wide survivor per planted
  * family, all later instances dropped); global conservation (exactly one
  * survivor per distinct paragraph text — the small-vocab corpus also
  * collides NATURAL chunks across docs, and those are true duplicates);
  * and the doc-level CONTRAST — every doc is globally unique at doc
  * granularity, so doc-level dedup (q12 semantics) removes nothing, while
  * the paragraph pass strips the shared chrome.
  */
class ParagraphDedupSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  /** Single-threaded mirror: same 20-word chunking, same plants, same
    * first-occurrence rule, implemented with a plain HashMap walk.
    */
  private def mirror(): Map[Long, (Long, Long, Long, String)] = {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val paras = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, String)]
    base.foreach { case (id, t) =>
      val w = t.trim.split("\\s+")
      (0 to (w.length - 1) / 20).foreach { i =>
        paras += ((id, i, w.slice(i * 20, i * 20 + 20).mkString(" ")))
      }
      if (id % 7 == 3) paras += ((id, -1, TextOps.CookiePara))
      if (id % 5 == 1) paras += ((id, 999, TextOps.NewsletterPara))
    }
    val seen = scala.collection.mutable.HashSet.empty[String]
    val kept = paras.sortBy(p => (p._1, p._2)).map { case (id, idx, p) =>
      (id, idx, p, seen.add(p))
    }
    kept.groupBy(_._1).map { case (id, rows) =>
      val sorted = rows.sortBy(_._2)
      id -> (rows.size.toLong, rows.count(_._4).toLong,
        rows.count(!_._4).toLong,
        sorted.filter(_._4).map(_._3).mkString(" "))
    }
  }

  test("t25 == single-threaded first-occurrence mirror exactly") {
    val got = TextOps.paragraphDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toMap
    val want = mirror()
    assert(got.keySet == want.keySet)
    got.foreach { case (id, g) => assert(g == want(id), s"doc $id") }
  }

  test("boilerplate: one corpus-wide survivor per family; global conservation") {
    val rows = TextOps.paragraphDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val byId = rows.map(r => r._1 -> r).toMap
    val cookieDocs = rows.map(_._1).filter(_ % 7 == 3).sorted
    val newsDocs = rows.map(_._1).filter(_ % 5 == 1).sorted
    assert(cookieDocs.size > 1 && newsDocs.size > 1, "fixture vacuous")
    // exactly the FIRST doc of each family keeps its boilerplate copy
    assert(byId(cookieDocs.head)._5.startsWith(TextOps.CookiePara))
    cookieDocs.tail.foreach { id =>
      assert(!byId(id)._5.contains(TextOps.CookiePara), s"doc $id kept a dup cookie para")
      assert(byId(id)._4 >= 1, s"doc $id dropped nothing")
    }
    assert(byId(newsDocs.head)._5.endsWith(TextOps.NewsletterPara))
    newsDocs.tail.foreach { id =>
      assert(!byId(id)._5.contains(TextOps.NewsletterPara), s"doc $id kept a dup newsletter para")
    }
    // global conservation: exactly ONE survivor per distinct paragraph
    // text — dedup never over- or under-deletes (natural cross-doc chunk
    // collisions in the small-vocab corpus are TRUE duplicates and must
    // drop too, which is why per-doc "untouched" claims don't hold here)
    val distinctParas = TextOps.paragraphTable(spark, dir)
      .select("para").distinct().count()
    assert(rows.map(_._3).sum == distinctParas,
      "sum(n_kept) != distinct paragraph count")
    assert(rows.map(r => r._3 + r._4).sum == rows.map(_._2).sum,
      "kept + dropped != total")
  }

  test("contrast: doc-level dedup sees nothing — every doc's full text is unique") {
    // the boilerplate-carrying docs differ in their natural paragraphs, so
    // hashing WHOLE documents (q12 semantics) finds zero duplicates; only
    // the paragraph pass can strip the shared chrome
    import org.apache.spark.sql.functions._
    val t = TextOps.paragraphTable(spark, dir)
      .groupBy("doc_id")
      .agg(md5(concat_ws(" ", sort_array(collect_list(
        struct(col("para_idx"), col("para"))))
        .cast("array<string>"))).as("h"))
    val docLevelDups = t.groupBy("h").count().where(col("count") > 1).count()
    assert(docLevelDups == 0L,
      "constructed docs collide at doc level — contrast claim broken")
  }
}
