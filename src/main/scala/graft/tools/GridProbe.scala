package graft.tools

import org.apache.spark.sql.SparkSession
import graft.kg._

/** Scratch phase-timer for the experiment_grid query (round 6): where
  * do the ~4-5 s go — generation/caches, pool build, or the arms? */
object GridProbe {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[gridprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val cfg = TranscriptGen.Config(nConvs = 2000)
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val turns = time("turns cache")({ val t = TranscriptGen.transcripts(spark, cfg).cache(); t.count(); t })
      val gold = time("gold cache")({ val g = TranscriptGen.goldMentions(spark, cfg).cache(); g.count(); g })
      val (trainT, testT) = Experiments.seededSplit(turns, "conv_id", 20, 42L)
      val (trainG, testG) = Experiments.seededSplit(gold, "conv_id", 20, 42L)
      val pool = time("buildPool")(FewShots.buildPool(trainT, trainG, 240))
      val testGc = testG.cache()
      val arm = Experiments.Arm(PromptTechniques.Discussion, Extraction.FstSentence, 3)
      time("arm prompts+detect+prf") {
        val prompts = Extraction.buildPromptsWithShots(testT, pool, arm.nbFewShots, arm.fst)
        val mentions = PromptTechniques.detectMentions(prompts, arm.technique, cfg)
        Metrics.weightedPRF(Metrics.align(mentions, testGc))
      }
      time("arm2 zero-shot") {
        val prompts = Extraction.buildPromptsWithShots(testT, Array.empty, 0, Extraction.FstNone)
        val mentions = PromptTechniques.detectMentions(prompts, PromptTechniques.Discussion, cfg)
        Metrics.weightedPRF(Metrics.align(mentions, testGc))
      }
      testGc.unpersist(); turns.unpersist(); gold.unpersist()
    }
    spark.stop()
  }
}
