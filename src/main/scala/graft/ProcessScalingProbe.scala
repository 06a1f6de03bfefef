package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Dev-only control experiment for the cluster-mode scaling number
  * (BENCH/BASELINE.md): N raw JVM PROCESSES — no Spark, no shuffle, no
  * executors — each pinned to its own CPUs with the same per-process
  * footprint as a cluster-mode executor (1 GiB fixed pre-touched heap,
  * 2 worker threads), running the identical per-row frontier kernel
  * (Gen.seedOf + UrlKit.canonicalize) that MemCeilingProbe uses for the
  * thread-mode control.
  *
  * If P=1 -> P=4 processes shows the same sub-0.8 efficiency as
  * 2 -> 8 Spark executors at matching footprints, the residual is the
  * host's shared memory system, not the engine: there is no Spark code
  * in this probe at all.
  *
  * Measurement is DURATION-based (each child counts rows processed in a
  * fixed window and reports rows/sec; the level's throughput is the sum)
  * so imperfect child start alignment cannot bias the ratio the way a
  * wall-of-fixed-work measurement would.
  *
  * Orchestrate: `runMain graft.ProcessScalingProbe` (levels 1,4
  * interleaved 3 rounds). Child mode: `child <threads> <seconds>`.
  */
object ProcessScalingProbe {

  private val RowSpace = 8000000L

  private def kernelBlock(start: Long, n: Long): Long = {
    var acc = 0L
    var i = start
    val end = start + n
    while (i < end) {
      val s = graft.sources.Gen.seedOf(i % RowSpace, RowSpace)
      acc += graft.functions.UrlKit.canonicalize(s.url).length
      i += 1
    }
    acc
  }

  private def runChild(threads: Int, seconds: Int): Unit = {
    kernelBlock(0L, 200000L) // warm JIT
    val deadline = System.nanoTime() + seconds * 1000000000L
    val counts = new java.util.concurrent.atomic.AtomicLong()
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        val block = 100000L
        var off = t * 1000000L
        var done = 0L
        while (System.nanoTime() < deadline) {
          sink.addAndGet(kernelBlock(off, block))
          off += block
          done += block
        }
        counts.addAndGet(done)
      })
      th.start(); th
    }
    ts.foreach(_.join())
    require(sink.get() != 0L)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"""{"threads":$threads,"rows":${counts.get()},"wall":$wall%.2f,"rows_per_sec":${counts.get() / wall}%.0f}""")
  }

  private def allowedCpus: Seq[Int] = {
    val spec = try {
      Files.readString(Paths.get("/proc/self/status")).linesIterator
        .find(_.startsWith("Cpus_allowed_list:")).map(_.split(":")(1).trim)
    } catch { case _: Exception => None }
    spec.filter(_.nonEmpty).map { s =>
      s.split(",").toSeq.flatMap { part =>
        part.split("-").map(_.trim) match {
          case Array(a, b) => a.toInt to b.toInt
          case Array(a)    => Seq(a.toInt)
        }
      }
    }.getOrElse(0 until Runtime.getRuntime.availableProcessors())
  }

  private def spawnLevel(procs: Int, coresPerProc: Int, heapMb: Int,
                         seconds: Int): Double = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path") +
      java.io.File.pathSeparator +
      getClass.getProtectionDomain.getCodeSource.getLocation.getPath
    val cpus = allowedCpus
    val taskset = Seq("/usr/bin/taskset", "/bin/taskset")
      .find(p => Files.isExecutable(Paths.get(p)))
    val children = (0 until procs).map { j =>
      val pin = taskset match {
        case Some(bin) if cpus.size >= (j + 1) * coresPerProc =>
          Seq(bin, "-c",
            cpus.slice(j * coresPerProc, (j + 1) * coresPerProc).mkString(","))
        case _ => Seq.empty
      }
      val cmd = (pin ++ Seq(javaBin,
        s"-Xms${heapMb}m", s"-Xmx${heapMb}m", "-XX:+AlwaysPreTouch",
        "-cp", cp, "graft.ProcessScalingProbe",
        "child", coresPerProc.toString, seconds.toString)).asJava
      new ProcessBuilder(cmd).redirectErrorStream(true).start()
    }
    val outs = children.map(p => new String(p.getInputStream.readAllBytes()))
    children.foreach(_.waitFor())
    outs.map { out =>
      val line = out.linesIterator.find(_.startsWith("""{"threads""""))
        .getOrElse(throw new IllegalStateException(s"no child JSON:\n$out"))
      """"rows_per_sec":([0-9.]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
    }.sum
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 3 && args(0) == "child") {
      runChild(args(1).toInt, args(2).toInt); return
    }
    val coresPerProc = sys.env.getOrElse("SPARK_GRAFT_EXEC_CORES", "2").toInt
    val heapMb = sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM_MB", "1024").toInt
    val seconds = sys.env.getOrElse("SPARK_GRAFT_PROBE_SECS", "8").toInt
    val levels = sys.env.getOrElse("SPARK_GRAFT_PROC_LEVELS", "1,4")
      .split(",").map(_.trim.toInt)
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "3").toInt
    val runs: Seq[(Int, Double)] =
      (1 to rounds).flatMap(_ =>
        levels.map(p => p -> spawnLevel(p, coresPerProc, heapMb, seconds)))
    val best: Map[Int, Double] =
      runs.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    levels.foreach { p =>
      println(f"""{"procs":$p,"cores":${p * coresPerProc},"thr":${best(p)}%.0f}""")
    }
    levels.sliding(2).filter(_.length == 2).foreach { case Array(lo, hi) =>
      val eff = (best(hi) / best(lo)) / (hi.toDouble / lo)
      println(f"""{"pair":"${lo}p->${hi}p","efficiency":$eff%.3f}""")
    }
  }
}
