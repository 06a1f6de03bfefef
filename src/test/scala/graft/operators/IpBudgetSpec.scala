package graft.operators

import graft.SparkTestBase.spark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** c70 goldens (per-IP politeness). Pinned: the capped schedule equals a
  * single-threaded group-sort-take mirror keyed by the resolved address
  * exactly; the planted vhost farm collectively lands AT the cap while
  * ordinary co-hosted sites are untouched; unresolved hosts fail OPEN as
  * their own bucket; and the DNS catalog is deterministic (farm suffix
  * pins the farm address, everything else stable-hashes into the /24).
  */
class IpBudgetSpec extends AnyFunSuite {

  private def sched(n: Long) = spark.range(0, n).select(
    xxhash64(col("id")).as("url_hash"),
    when(pmod(col("id"), lit(40)) < 10,
      concat(lit("vh"), pmod(col("id"), lit(40)).cast("string"),
        lit(".shared.example.com")))
      .otherwise(concat(lit("site"), pmod(col("id"), lit(40)).cast("string"),
        lit(".example.org"))).as("host"),
    (pmod(xxhash64(col("id") + 1), lit(1000)) / lit(100.0)).as("priority"))

  test("capped schedule == group-sort-take mirror on the resolved address") {
    val s = sched(4000L)
    val dns = IpOps.syntheticDns(s.select("host"))
    val ipOf = dns.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val rows = s.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2)))
    val mirror = rows.groupBy { case (_, h, _) => ipOf(h) }
      .values.flatMap(_.sortBy { case (uh, _, p) => (-p, uh) }.take(25))
      .map { case (uh, h, p) => (uh, h, p) }.toSet
    val got = IpOps.applyIpBudget(s, dns, 25).collect()
      .map(r => (r.getLong(1), r.getString(0), r.getDouble(2))).toSet
    assert(got == mirror)
  }

  test("farm lands at the cap, co-hosted sites untouched, unresolved fails open") {
    val demo = IpOps.ipBudgetDemo(spark).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val farm = demo.filter(_._1 == "10.0.0.1")
    assert(farm.length == 1)
    assert(farm.head._2 > 25 && farm.head._3 == 25,
      s"farm must be cut to the cap: ${farm.head}")
    val rest = demo.filter(_._1 != "10.0.0.1")
    assert(rest.nonEmpty)
    rest.foreach { case (ip, before, after) =>
      assert(after == math.min(before, 25L), s"$ip: $before -> $after")
    }
    // unresolved host: its own bucket, not dropped, capped per host
    val s = sched(400L)
    val partial = IpOps.syntheticDns(s.select("host"))
      .where(!col("host").startsWith("site15."))
    val got = IpOps.applyIpBudget(s, partial, 25)
    val unresolved = got.where(col("host").startsWith("site15.")).count()
    assert(unresolved > 0, "unresolved hosts must not be dropped")
  }
}
