package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** c73 goldens (rel=canonical consolidation). Pinned: the combined-channel
  * resolution equals a single-threaded walk with the same priority rule
  * (redirect shadows canonical — a redirecting URL never shows its tag);
  * the walk provably interleaves channels (canonical hop, then redirect
  * hops); the cycle base whose canonical is shadowed stays in the loop
  * verdict; and the consolidated group sizes are exact.
  */
class CanonicalSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  private lazy val ids: Seq[Long] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSeq

  // combined successor with redirect-over-canonical priority
  private def succ(u: Long): Option[Long] =
    if (u % 5 != 0) Some(u - 1)
    else if ((u / 5) % 10 == 9) Some(u + 4)
    else if (u % 7 == 3 && u >= 3) Some(u - 3)
    else None

  private def walk(u: Long, maxHops: Int = 8): (Long, Int, Boolean) = {
    var cur = u; var hops = 0
    while (hops < maxHops && succ(cur).isDefined) { cur = succ(cur).get; hops += 1 }
    (cur, hops, hops >= maxHops)
  }

  private def mirror(): Map[Long, (Long, Int, Boolean, Long)] = {
    val resolved = ids.map(u => u -> walk(u)).toMap
    val sizes = resolved.values.groupBy(_._1).map { case (f, g) => f -> g.size.toLong }
    resolved.map { case (u, (f, h, ex)) => u -> ((f, h, ex, sizes(f))) }
  }

  test("c73 consolidation == single-threaded priority walk exactly") {
    val got = CanonicalOps.consolidate(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getBoolean(3), r.getLong(4))))
      .toMap
    assert(got == mirror())
  }

  test("channels interleave: a canonical hop is followed by redirect hops") {
    // a doc with succ chain redirect* -> canonical -> redirect+ exists:
    // any canonical source u (u%5==0, u%7==3, not a cycle base) points at
    // u-3 which has u-3 % 5 = 2 -> two more redirect hops to its base
    val srcs = ids.filter(u => u % 5 == 0 && u % 7 == 3 && u >= 3 &&
      (u / 5) % 10 != 9)
    assert(srcs.nonEmpty, "testdata has no canonical source; plant is dead")
    var terminated = 0
    srcs.foreach { u =>
      val (f, h, ex) = walk(u)
      if (((u - 5) / 5) % 10 == 9) {
        // the tag lands in a chain whose base is a rewired 5-cycle:
        // canonical hop + redirect hops + loop verdict — still interleaved
        assert(ex, s"canonical source $u should spin in the landing cycle")
      } else {
        assert(!ex && h == 3 && f == u - 5,
          s"canonical source $u should resolve via 1 canonical + 2 redirect hops")
        terminated += 1
      }
    }
    assert(terminated > 0, "no canonical source lands on a terminal base")
  }

  test("redirect shadows canonical: the cycle base with a tag stays a loop") {
    val shadowed = ids.filter(u => u % 5 == 0 && (u / 5) % 10 == 9 && u % 7 == 3)
    assert(shadowed.nonEmpty, "no cycle base carries a canonical tag at this sf")
    val got = CanonicalOps.consolidate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    shadowed.foreach { u =>
      assert(got(u), s"cycle base $u must stay hop-exceeded; its tag is invisible")
    }
  }

  test("c100 rule attribution is SOUND and COMPLETE vs the canon_url kernel on the frontier") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val flags = CanonicalOps.ruleFlags(
      graft.sources.Gen.seeds(spark, 4000).toDF()).collect()
    flags.foreach { r =>
      val anyRule = Seq("r_fragment", "r_host_case", "r_default_port",
        "r_dot_segments", "r_tracking", "r_param_order")
        .exists(c => r.getAs[Boolean](c))
      val changed = r.getAs[Boolean]("changed")
      assert(anyRule == changed,
        s"attribution mismatch for ${r.getAs[String]("url")}: " +
          s"rules=$anyRule changed=$changed")
    }
    // every rule must actually fire somewhere on the generator's mix
    val att = CanonicalOps.ruleAttribution(spark).collect()
      .map(r => r.getAs[String]("rule") -> r.getAs[Long]("n_fired")).toMap
    Seq("fragment", "host_case", "default_port", "dot_segments",
      "tracking_params", "param_order").foreach { rule =>
      assert(att(rule) > 0L, s"rule $rule never fires on the frontier mix")
    }
    assert(att("changed") > 0L && att("changed") < att("total"),
      "the generator mix must contain both clean and canonicalizing URLs")
  }
}
