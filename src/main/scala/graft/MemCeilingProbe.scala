package graft

import java.util.concurrent.atomic.AtomicLong

/** Dev-only: reproducible evidence for the sandbox memory ceiling cited in
  * BENCH/BASELINE.md. Runs the identical per-row kernel of the frontier job
  * (Gen.seedOf + UrlKit.canonicalize) on RAW JVM THREADS — no Spark, no
  * shuffle, no encoders — so whatever scaling limit appears here is the
  * platform's, not the engine's.
  *
  * Run one level per JVM, pinned, e.g.:
  *   taskset -c 0-7  java -Xms2g -Xmx2g -XX:+AlwaysPreTouch \
  *     -cp <classes:spark-jars> graft.MemCeilingProbe 8
  *   taskset -c 0-31 java -Xms8g -Xmx8g -XX:+AlwaysPreTouch \
  *     -cp <classes:spark-jars> graft.MemCeilingProbe 32
  *
  * Page-commit cost curve (the other half of the evidence) is measured with
  * plain `time java -Xms<N>g -Xmx<N>g -XX:+AlwaysPreTouch -version`.
  */
object MemCeilingProbe {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else Runtime.getRuntime.availableProcessors()
    val perThread = 1000000L
    def work(tid: Int): Long = {
      var acc = 0L
      var i = tid * perThread
      val end = i + perThread
      while (i < end) {
        val s = graft.sources.Gen.seedOf(i, 8000000L)
        val c = graft.functions.UrlKit.canonicalize(s.url)
        acc += c.length
        i += 1
      }
      acc
    }
    work(0) // warm JIT
    val walls = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val total = new AtomicLong()
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => { total.addAndGet(work(t)) })
        th.start(); th
      }
      ts.foreach(_.join())
      require(total.get() > 0)
      (System.nanoTime() - t0) / 1e9
    }
    val wall = walls.min
    println(f"""{"threads":$threads,"wall":$wall%.2f,"rows":${threads * perThread},"rows_per_sec":${(threads * perThread / wall)}%.0f}""")
  }
}
