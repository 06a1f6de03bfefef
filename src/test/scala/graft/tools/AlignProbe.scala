package graft.tools

import graft.SparkTestBase.spark
import graft.operators.AlignOps

/** One-off calibration probe for c76's alignment threshold (kept: re-run
  * after changing the corpus or either tower stub). Prints the cosine
  * bands of the three caption classes; tau must sit between the true
  * band's min and both plant bands' max.
  */
object AlignProbe {
  def main(args: Array[String]): Unit = {
    val n = 96
    val got = AlignOps.alignmentGate(AlignOps.alignCorpus(spark, n)).collect()
      .map(r => (r.getString(0).drop(5).toInt, r.getDouble(2)))
    def band(p: Int => Boolean) = {
      val xs = got.filter(t => p(t._1)).map(_._2)
      f"n=${xs.length} min=${xs.min}%.4f max=${xs.max}%.4f"
    }
    println("true : " + band(i => i % 6 != 0 && i % 9 != 0))
    println("swap : " + band(i => i % 6 == 0))
    println("junk : " + band(i => i % 6 != 0 && i % 9 == 0))
  }
}
