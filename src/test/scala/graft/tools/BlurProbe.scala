package graft.tools

import graft.SparkTestBase.spark
import graft.operators.ImageOps

/** One-off calibration probe for c57's sharpness threshold (kept: re-run
  * after changing the corpus or the kernel).
  */
object BlurProbe {
  def main(args: Array[String]): Unit = {
    val a = ImageOps.blurAudit(ImageOps.blurCorpus(spark, 60)).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val (blur, sharp) = a.partition(_._1.endsWith("-blur"))
    println("sharp min/max: " + sharp.map(_._2).min + " " + sharp.map(_._2).max)
    println("blur  min/max: " + blur.map(_._2).min + " " + blur.map(_._2).max)
  }
}
