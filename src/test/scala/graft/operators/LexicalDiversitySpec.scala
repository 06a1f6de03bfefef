package graft.operators

import graft.SparkTestBase.spark
import org.scalatest.funsuite.AnyFunSuite

/** t38 lexical diversity: distributed histogram rollup == a single-threaded
  * tokenize-and-count mirror, bit-for-bit (the DuckDB oracle re-checks the
  * same algebra at sf0.01; this pins the kernel and the edge cases).
  */
class LexicalDiversitySpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private def mirror(text: String): Option[(Long, Long, Double, Double)] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.isEmpty) None
    else {
      val counts = toks.groupBy(identity).map { case (_, v) => v.length }
      val types = counts.size.toLong
      val hapax = counts.count(_ == 1).toLong
      def r4(x: Double) = BigDecimal(x)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      Some((toks.length.toLong, types,
        r4(types.toDouble / toks.length), r4(hapax.toDouble / types)))
    }
  }

  test("lexicalDiversity == per-doc mirror on the full sf0.001 corpus") {
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.lexicalDiversity(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val expected = texts.flatMap { case (id, t) => mirror(t).map(id -> _) }
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("boilerplate text scores low TTR; unique-token text scores 1.0") {
    import spark.implicits._
    val tmp = graft.SparkTestBase.tempDir("graft-t38")
    Seq(
      (1L, "spam spam spam spam spam spam spam spam", "en", "s", 40L),
      (2L, "every token here appears exactly once total", "en", "s", 44L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = TextOps.lexicalDiversity(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(rows(1L) == ((0.125, 0.0))) // 1 type / 8 tokens, no hapax
    assert(rows(2L) == ((1.0, 1.0)))   // all types, all hapax
  }
}
