package graft

/** Shared session knobs for the driver-contract mains. */
object SparkEnv {
  /** tmpfs-backed spark.local.dir when available. Measured in this sandbox:
    * shuffle files on the root disk serialize multi-core local mode (E1 at
    * local[32] ran no faster than local[8]); on /dev/shm the same job
    * scaled 2.4x. A real cluster provides fast local shuffle disks; tmpfs
    * is the local-mode stand-in.
    */
  def localDir: Option[String] = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val p = new java.io.File(shm, "graft-spark-local")
      p.mkdirs()
      Some(p.getAbsolutePath)
    } else None
  }

  def applyCommon(b: org.apache.spark.sql.SparkSession.Builder): org.apache.spark.sql.SparkSession.Builder = {
    localDir.foreach(d => b.config("spark.local.dir", d))
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
  }
}
