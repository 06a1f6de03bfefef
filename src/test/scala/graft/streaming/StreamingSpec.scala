package graft.streaming

import graft.SparkTestBase.spark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("streaming windowed agg == batch equivalent") {
    val streamed = StreamingJobs.windowedEventCounts(spark, dir)
      .orderBy("hour_ts", "event_type").collect().toSeq
    val batch = graft.operators.Relational.timeWindowEvents(spark, dir)
      .orderBy("hour_ts", "event_type").collect().toSeq
    assert(streamed == batch, "stream complete-mode result != batch groupBy")
  }

  test("stateful politeness: budgets + cross-batch state carry-over") {
    val out = StreamingJobs.politenessDemo(spark, n = 2000, budget = 30)
      .select("host", "slot").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    val byHost = out.groupBy(_._1)
    assert(byHost.nonEmpty)
    byHost.foreach { case (host, xs) =>
      val slots = xs.map(_._2).sorted.toSeq
      assert(slots == (0 until xs.length), s"$host slots not dense 0..n-1: state lost across batches?")
      assert(xs.length <= 30, s"$host exceeded budget")
    }
    // at least one host must have hit the budget cap across 3 micro-batches
    assert(byHost.values.exists(_.length == 30), "no host reached budget — test too weak")
  }
}
