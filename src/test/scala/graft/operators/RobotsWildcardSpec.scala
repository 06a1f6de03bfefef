package graft.operators

import graft.SparkTestBase.spark
import graft.functions.RobotsKit
import graft.model.RobotsRule
import org.scalatest.funsuite.AnyFunSuite

/** c41 goldens: the wildcard matcher against the RFC 9309 / Google REP
  * example table, precedence semantics, kernel == Catalyst-column parity
  * on a deterministic fuzz set, demo == sequential mirror, and base-parse
  * non-regression (the prefix engine still drops-and-counts).
  */
class RobotsWildcardSpec extends AnyFunSuite {
  import spark.implicits._

  test("wildcardMatches: RFC 9309 / REP example table") {
    val cases = Seq(
      // (pattern, path, matches)
      ("/fish", "/fish", true), ("/fish", "/fishheads", true),
      ("/fish", "/fish/salmon", true), ("/fish", "/Fish", false),
      ("/fish*", "/fish", true), ("/fish*", "/fishheads/yummy", true),
      ("/fish/", "/fish/", true), ("/fish/", "/fish", false),
      ("/*.php", "/index.php", true), ("/*.php", "/folder/any.php.file", true),
      ("/*.php", "/", false), ("/*.php", "/windows.PHP", false),
      ("/*.php$", "/filename.php", true), ("/*.php$", "/filename.php5", false),
      ("/*.php$", "/filename.php?parameters", false),
      ("/fish*.php", "/fish.php", true), ("/fish*.php", "/fishheads/catfish.php?p=1", true),
      ("/fish*.php", "/Fish.PHP", false),
      ("/tmp$", "/tmp", true), ("/tmp$", "/tmp/", false),
      ("/a*b*c", "/aXbYc-and-more", true), ("/a*b*c$", "/aXbYc", true),
      ("/a*b*c$", "/aXbYc-and-more", false), ("/a*c*b", "/abc", false),
      ("$", "", true), ("/", "/anything", true))
    cases.foreach { case (p, path, want) =>
      assert(RobotsKit.wildcardMatches(p, path) == want, s"($p, $path)")
    }
  }

  test("precedence: longest pattern wins; equal-length tie -> allow; no match -> allow") {
    val r = Seq(RobotsRule(allow = false, "/page"), RobotsRule(allow = true, "/*.html$"))
    assert(RobotsKit.wildcardAllowed(r, "/page.html"))   // 8 > 5 (Google example)
    assert(!RobotsKit.wildcardAllowed(r, "/page"))
    assert(RobotsKit.wildcardAllowed(r, "/elsewhere"))
    val tie = Seq(RobotsRule(allow = false, "/p"), RobotsRule(allow = true, "/p"))
    assert(RobotsKit.wildcardAllowed(tie, "/p/x"))
    assert(RobotsKit.wildcardAllowed(Seq.empty, "/x"))
  }

  test("Catalyst column == kernel on a deterministic fuzz set (regex escaping)") {
    val pieces = Seq("/", "a", ".php", "$x", "(b)", "[c]", "x+y", "^z", "|", "\\d", "%_", "日")
    val pats = for {
      i <- pieces.indices; j <- pieces.indices
      star <- Seq(true, false); anchor <- Seq(true, false)
    } yield {
      val core = "/" + pieces(i) + (if (star) "*" else "") + pieces(j)
      (if (anchor) core + "$" else core)
    }
    val paths = Seq("/", "/a.php", "/aXX.php", "/$x(b)", "/[c]x+y", "/a^z|d",
      "/\\d%_", "/日本", "/a.phpx", "/a", "")
    val rules = pats.zipWithIndex.map { case (p, i) =>
      Seq(RobotsRule(allow = i % 2 == 0, p))
    }
    val rows = for { (rs, i) <- rules.zipWithIndex; path <- paths } yield (i.toLong, rs, path)
    val df = spark.createDataset(rows).toDF("id", "rules", "path")
    val got = df.select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("path"),
        FrontierJob.wildcardAllowedCol(
          org.apache.spark.sql.functions.col("rules"),
          org.apache.spark.sql.functions.col("path")).as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getBoolean(2)).toMap
    rows.foreach { case (i, rs, path) =>
      val want = RobotsKit.wildcardAllowed(rs, path)
      assert(got((i, path)) == want,
        s"column diverged from kernel: rule=${rs.head.prefix} path=$path")
    }
  }

  test("parseWildcard keeps wildcard rules; base parse still drops-and-counts") {
    val text = "User-agent: *\nDisallow: /*.php$\nAllow: /news/\nDisallow: /tmp$\n"
    val full = RobotsKit.parseWildcard(text)
    assert(full.rules == Seq(RobotsRule(allow = false, "/*.php$"),
      RobotsRule(allow = true, "/news/"), RobotsRule(allow = false, "/tmp$")))
    assert(full.nDroppedRules == 0)
    val base = RobotsKit.parse(text)
    assert(base.rules == Seq(RobotsRule(allow = true, "/news/")))
    assert(base.nDroppedRules == 2)
  }

  test("c41 demo == sequential mirror; divergence from the prefix engine is real") {
    val got = RobotsWildcardOps.wildcardVerdicts(spark).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))).toMap
    val texts = RobotsWildcardOps.robotsTexts().toMap
    var nDiverge = 0
    texts.foreach { case (host, text) =>
      val w = RobotsKit.parseWildcard(text).rules
      val p = RobotsKit.parse(text).rules
      RobotsWildcardOps.samplePaths.foreach { path =>
        val wantFull = RobotsKit.wildcardAllowed(w, path)
        // prefix-engine mirror: longest matching prefix wins (array order
        // breaks ties — the robotsAllowedCol contract), default allow
        val m = p.filter(r => path.startsWith(r.prefix))
        val wantPrefix = if (m.isEmpty) true
          else m.maxBy(_.prefix.length).allow
        val (gf, gp, gd) = got((host, path))
        assert(gf == wantFull, s"full verdict $host $path")
        assert(gp == wantPrefix, s"prefix verdict $host $path")
        assert(gd == (gf != gp), s"diverges flag $host $path")
        if (gd) nDiverge += 1
      }
    }
    assert(nDiverge >= 4, "no real divergence — the wildcard completion is vacuous")
    // spot semantics: anchored /tmp$ blocks /tmp but not /tmp/session
    val h2 = graft.sources.Gen.hostName(2)
    assert(!got((h2, "/tmp"))._1 && got((h2, "/tmp/session"))._1)
    // Google precedence example on shape 3
    val h3 = graft.sources.Gen.hostName(3)
    assert(got((h3, "/page.html"))._1 && !got((h3, "/page"))._1)
  }
}
