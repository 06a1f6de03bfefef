package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** q57 — Z-order (Morton) clustering keys: the write-time layout tool for
  * multi-column scan pruning at lake scale (Delta/Iceberg OPTIMIZE
  * ZORDER). Sorting a table by the bit-interleave of two columns gives
  * every file a TIGHT min/max zone on BOTH dimensions at once, so a
  * predicate on either column prunes files — a single-column sort gives
  * that for one dimension only. The interleave is the classic
  * magic-number bit spread (4 shift-and-mask steps per operand, Morton
  * 1966 / the "Interleave bits by Binary Magic Numbers" bit hack) —
  * pure integer Column arithmetic, whole-stage codegen, engine-exact,
  * so the layout metric is DuckDB-oracled hash-exactly.
  */
object LayoutOps {

  /** Spread the low 16 bits of `v` to even bit positions (Morton). All
    * arithmetic on BIGINT to keep both engines sign-free.
    */
  def spread16(v: Column): Column = {
    val m1 = lit(0x00FF00FFL); val m2 = lit(0x0F0F0F0FL)
    val m3 = lit(0x33333333L); val m4 = lit(0x55555555L)
    val x0 = v.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(m1)
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(m2)
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(m3)
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(m4)
  }

  /** 32-bit Morton key of two 16-bit operands: a on even bits, b on odd. */
  def zorder16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** JVM mirror for goldens. */
  def spread16Local(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    (x | (x << 1)) & 0x55555555L
  }

  def zorder16Local(a: Long, b: Long): Long =
    spread16Local(a) | (spread16Local(b) << 1)

  /** Inverse: gather even bits back to a 16-bit value (goldens only). */
  def gather16Local(z: Long): Long = {
    var x = z & 0x55555555L
    x = (x | (x >> 1)) & 0x33333333L
    x = (x | (x >> 2)) & 0x0F0F0F0FL
    x = (x | (x >> 4)) & 0x00FF00FFL
    (x | (x >> 8)) & 0xFFFFL
  }

  /** q57 — zone-map quality of a Z-ordered layout: key lineitem rows by
    * zorder(partkey mod 2^16, suppkey mod 2^16), cut the z-sorted table
    * into `nZones` equal-depth zones (the "file" analog), and report each
    * zone's min/max of BOTH dimensions — the zone map a scan planner
    * prunes with. Every zone's spans are a small fraction of the domain
    * on BOTH columns simultaneously; a single-column sort would give
    * full-domain spans on the other column. All arithmetic integer;
    * zone assignment via ntile over the z key (deterministic ties by the
    * key + both operands).
    */
  def zorderZones(spark: SparkSession, dir: String,
                  nZones: Int = 32): DataFrame = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(pmod(col("l_partkey").cast("long"), lit(65536L)).as("pk"),
        pmod(col("l_suppkey").cast("long"), lit(65536L)).as("sk"))
    val keyed = li.withColumn("z", zorder16(col("pk"), col("sk")))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("z").asc, col("pk").asc, col("sk").asc)
    keyed.withColumn("zone", ntile(nZones).over(w))
      .groupBy("zone")
      .agg(count(lit(1)).cast("long").as("n_rows"),
        min("pk").as("pk_min"), max("pk").as("pk_max"),
        min("sk").as("sk_min"), max("sk").as("sk_max"),
        min("z").as("z_min"), max("z").as("z_max"))
      .orderBy("zone")
  }
}
