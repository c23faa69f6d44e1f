package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query profiler: warm-times one SparkEntry query and
  * prints its formatted plan. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q29_lsh_jaccard")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    // warm-up on an unrelated action
    spark.read.parquet(s"$dir/nation.parquet").count()
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"[qprobe] $name rep$i rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (args.contains("--explain")) fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
