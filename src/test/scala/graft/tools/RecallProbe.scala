// scratch probe (not part of the library): measures emb02 ANN recall vs
// emb01 brute at several nBits on the driver testdata. Run with:
//   sbt -batch "Test/runMain graft.tools.RecallProbe"
package graft.tools

import graft.SparkTestBase.spark
import graft.operators.SimilarityOps

object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val brute = SimilarityOps.bruteCosineTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (bits <- Seq(4, 6); r <- Seq(0, 1, 2, 3)) {
      val ann = SimilarityOps.annLshTopK(spark, dir, nBits = bits, probeRadius = r)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = brute.intersect(ann).size.toDouble / brute.size
      println(f"[recall] nBits=$bits r=$r recall=$recall%.3f ann_rows=${ann.size}")
    }
  }
}
