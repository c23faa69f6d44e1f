package graft.tools

import org.apache.spark.sql.SparkSession
import graft.kg.{KGPipeline, TranscriptGen, Turn}

/** Large-corpus stress run: one order of magnitude above the bench
  * corpus, end-to-end from parquet, to evidence that the pipeline's
  * throughput and memory behavior hold as the input grows toward the
  * north rule's 10^12-turn target (spill-aware caches, no driver-side
  * state proportional to the corpus). Usage:
  *   runMain graft.tools.StressRun [nConvs=10000000] [reps=2] [cores=32]
  */
object StressRun {
  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toLong).getOrElse(10000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cores = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-stress-$nConvs-$cores")
      .config("spark.sql.shuffle.partitions", math.max(cores, 64))
      .config("spark.default.parallelism", math.max(cores, 64))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = s"/tmp/graft_bench_corpus_$nConvs"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      val t0 = System.nanoTime()
      TranscriptGen.transcripts(spark, TranscriptGen.Config(nConvs = nConvs))
        .repartition(128)
        .write.mode("overwrite").parquet(dir)
      System.err.println(f"[stress] corpus materialized in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val nTurns = spark.read.parquet(dir).count()
    val cfg = TranscriptGen.Config(nConvs = 0)
    (1 to reps).foreach { rep =>
      val turns = spark.read.parquet(dir).as[Turn]
      val t0 = System.nanoTime()
      val result = KGPipeline.run(spark, turns, cfg)
      val nTriples = result.triples.count()
      val wall = (System.nanoTime() - t0) / 1e9
      result.unpersistAll()
      System.gc()
      println(f"""{"stress":{"rep":$rep,"cores":$cores,"n_convs":$nConvs,"n_turns":$nTurns,"triples":$nTriples,"wall_sec":$wall%.1f,"triples_per_sec":${nTriples / wall}%.0f,"turns_per_sec":${nTurns / wall}%.0f}}""")
    }
    spark.stop()
  }
}
