package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for all specs (one JVM, forked by sbt). */
object SparkTestBase {

  /** Scratch dirs registered here are deleted when the suite JVM
    * exits NORMALLY; killed JVMs leave them behind, so creation also
    * sweeps stale same-prefix siblings older than 30 min (checkpoint
    * data is only meaningful to its creating context — a dir that
    * old belongs to a dead JVM). */
  def scratchDir(prefix: String): String = {
    val cutoff = System.currentTimeMillis() - 30 * 60000L
    Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(prefix) && f.lastModified() < cutoff)
      .foreach(deleteRecursive)
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursive(dir)))
    dir.toString
  }

  private def deleteRecursive(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursive)
    f.delete(): Unit
  }

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.sparkContext.setCheckpointDir(scratchDir("graft-ckpt"))
    s
  }
}
