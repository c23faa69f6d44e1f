package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Round-6 optimization harness (guide §1): per-query isolation with
  * BOTH the bench's action (count) and the noop sink (computes every
  * column, §1.4), plus `.explain("formatted")` dumped to
  * plans/r06/<name>_<tag>.txt for the before/after evidence the round
  * deliverables require. Bench.scala itself is frozen — this is the
  * separate main the brief asks for.
  *
  * Usage: runMain graft.tools.BenchExtra <tag> <q1,q2,...> [reps]
  *   tag   -> suffix for the plan file (before/after)
  *   reps  -> warm repetitions (default 3; first rep reported too)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("q68_pagerank"))
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same untimed warm-up as Bench: JIT + codegen + encoder init
    try { graft.SparkEntry.entry(spark).count() } catch { case _: Throwable => () }
    try { spark.read.parquet(s"$dir/nation.parquet").count() } catch { case _: Throwable => () }
    Files.createDirectories(Paths.get("plans/r06"))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"benchextra:$name")
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val noop = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // capture the formatted plan (explain prints to stdout)
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
        fn(spark, dir).explain("formatted")
      }
      Files.write(Paths.get(s"plans/r06/${name}_$tag.txt"), buf.toByteArray)
      println(f"[benchextra] $name%-28s count=" +
        walls.map(w => f"$w%.2f").mkString("/") +
        f" min=${walls.min}%.2f noop=$noop%.2f s  (plan -> plans/r06/${name}_$tag.txt)")
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
