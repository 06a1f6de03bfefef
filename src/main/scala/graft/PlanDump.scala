package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: write `.explain("formatted")` of named SparkEntry queries to
  * files (the judge-facing plan evidence under plans/rNN/). Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.PlanDump plans/r06 suffix q1 q2 ..."
  * First arg = output dir, second = filename suffix (e.g. before/after).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEnv.applyCommon(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      val nEx = "Exchange".r.findAllIn(plan).length
      val nReuse = "ReusedExchange".r.findAllIn(plan).length
      println(s"[plandump] $name -> $outDir/${name}_$suffix.txt " +
        s"(Exchange=$nEx Reused=$nReuse)")
    }
    spark.stop()
  }
}
