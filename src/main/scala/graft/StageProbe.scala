package graft

import graft.operators.FrontierJob
import graft.sources.{Gen, SeenStore}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: per-stage wall time of the E1 pipeline. Run one level per JVM:
  * spark-submit --master local[N] --class graft.StageProbe <jar>
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "4000000").toLong
    val spark = SparkSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val label = spark.sparkContext.master
    import spark.implicits._
    val robots = Gen.robots(spark)
    val cfg = FrontierJob.Config(epoch = 0, saltBuckets = 64)

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(lbl: String)(f: => Unit): Unit = {
      f // warm
      val walls = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label $lbl%-18s ${walls.min}%8.2f s (runs ${walls.map(w => f"$w%.1f").mkString(",")})")
    }

    val seeds = Gen.seeds(spark, n, 64)
    time("gen")(noop(seeds.toDF()))
    val frontier = FrontierJob.canonicalizeFrontier(seeds)
    time("canon_dedupe")(noop(frontier))
    val deduped = FrontierJob.dedupeAgainstSeen(frontier, SeenStore.emptySeen(spark), Map.empty, 64)
    val allowed = FrontierJob.applyRobots(deduped, robots, cfg)
    time("robots")(noop(allowed))
    val sched = FrontierJob.schedule(allowed, cfg)
    time("windows")(noop(sched))
    val full = FrontierJob.applyGlobalBudget(sched, cfg)
    time("full_e1")(noop(full.toDF()))
    spark.stop()
  }
}
