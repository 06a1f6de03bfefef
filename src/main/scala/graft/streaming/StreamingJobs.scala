package graft.streaming

import graft.model.{Scheduled, Seed}

/** Keyed politeness state (top-level: Catalyst encoders need a public
  * constructor for codegen).
  */
final case class HostState(nextSlot: Int)
import graft.operators.FrontierJob
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Structured Streaming skin (SURVEY.md §2.10 phase-2): the same epoch
  * semantics expressed over streams. Batch remains the production path
  * (epochs are resumable micro-batches by construction); these jobs prove
  * the operators carry over: watermarked windowed aggregation, and per-host
  * politeness as explicit keyed state via flatMapGroupsWithState.
  */
object StreamingJobs {

  /** Tumbling 1h windowed counts over the events table consumed AS A
    * STREAM (one file per trigger), complete-mode memory sink. The final
    * table equals the batch groupBy — which is exactly what the DuckDB
    * oracle checks (q18).
    */
  def windowedEventCounts(spark: SparkSession, dir: String): DataFrame = {
    val batchSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val name = s"stream_win_${math.abs(dir.hashCode)}"
    // FileStreamSource needs a directory; the sf dirs hold one file per
    // table, so stream the dir with a glob pinned to the events table.
    val stream = spark.readStream
      .schema(batchSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events*.parquet")
      .parquet(dir)
    val agg = stream
      // NTZ -> LTZ under the pinned UTC session (watermarks require TIMESTAMP)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        col("event_type"), col("n"), col("total"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** Per-host politeness as EXPLICIT streaming state: each incoming
    * frontier entry takes the host's next slot (FIFO within arrival order,
    * budget-capped), state carried across micro-batches by
    * flatMapGroupsWithState — the streaming analog of the batch window
    * scheduler, with the priority queue materialized as keyed state.
    */
  def statefulPoliteness(
      entries: Dataset[(String, Long, Double)], // (host, url_hash, priority)
      budget: Int,
      delayMs: Long,
      t0Ms: Long): Dataset[Scheduled] = {
    import entries.sparkSession.implicits._
    entries
      .groupByKey(_._1)
      .flatMapGroupsWithState[HostState, Scheduled](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (host, rows, state: GroupState[HostState]) =>
          var next = state.getOption.map(_.nextSlot).getOrElse(0)
          // deterministic in-batch order: (priority desc, url_hash asc)
          val sorted = rows.toSeq.sortBy(r => (-r._3, r._2))
          val out = sorted.iterator.takeWhile(_ => next < budget).map { r =>
            val s = Scheduled(s"http://$host/", r._2, host, "/", r._3,
              next, t0Ms + next.toLong * delayMs, 0)
            next += 1
            s
          }.toVector
          state.update(HostState(next))
          out.iterator
      }
  }

  /** Driver-contract wrapper: run statefulPoliteness over a MemoryStream
    * of synthetic frontier entries split into 3 micro-batches; returns the
    * full scheduled output (rows-only gate; scalatest asserts budget/slot
    * invariants and cross-batch state carry-over).
    */
  def politenessDemo(spark: SparkSession, n: Int = 3000, budget: Int = 40): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val frontier = FrontierJob.canonicalizeFrontier(graft.sources.Gen.seeds(spark, n))
      .select(col("host"), col("url_hash"), col("priority"))
      .as[(String, Long, Double)]
      .collect()
    val stream = MemoryStream[(String, Long, Double)]
    val out = statefulPoliteness(stream.toDS(), budget, delayMs = 200L, t0Ms = 1704067200000L)
    val name = s"stream_polite_$n"
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name).start()
    try {
      val third = frontier.length / 3
      stream.addData(frontier.take(third).toIndexedSeq)
      q.processAllAvailable()
      stream.addData(frontier.slice(third, 2 * third).toIndexedSeq)
      q.processAllAvailable()
      stream.addData(frontier.drop(2 * third).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).orderBy("host", "slot")
  }
}
