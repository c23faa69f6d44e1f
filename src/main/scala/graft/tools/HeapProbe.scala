package graft.tools

/** Prints the forked JVM's heap — confirms the build.sbt scoping
  * actually reaches `runMain` forks (Bench's scaling-corpus sizing
  * depends on it; see the sbt-scoping gotcha in the verify skill). */
object HeapProbe {
  def main(args: Array[String]): Unit =
    println(s"maxMemoryGb=${Runtime.getRuntime.maxMemory() / (1L << 30)}")
}
