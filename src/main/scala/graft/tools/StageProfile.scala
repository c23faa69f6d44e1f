package graft.tools

import org.apache.spark.sql.SparkSession
import graft.kg._

/** Ad-hoc stage profiler over the materialized bench corpus: times
  * each pipeline stage separately at the given parallelism to locate
  * fixed overhead vs scalable work. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32").toInt
    val dir = args.lift(1).getOrElse("/tmp/graft_bench_corpus_200000")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.default.parallelism", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round (cores=$cores) ---")
      val cfg = TranscriptGen.Config(nConvs = 0)
      val turns = spark.read.parquet(dir).as[Turn]
      val prompts = Extraction.buildPrompts(turns)
      val scored = Extraction.scoreMentions(prompts, cfg)
      val extracted = time("extract fused (cache+count)") {
        val e = Extraction.extractAll(scored, cfg).cache()
        e.count(); e
      }
      val verified = extracted.flatMap(e =>
        e.verified.map { case (m, t) => Mention(e.conv_id, e.turn_idx, m, t) })
      val relations = extracted.flatMap(e =>
        e.relations.map { case (s, p, o) => Relation(e.conv_id, e.turn_idx, s, p, o) })
      val links = time("linking (cache+count)") {
        val l = EntityLinking.link(verified, Lexicon.catalogue.toArray).cache()
        l.count(); l
      }
      val canon = time("canonicalize") {
        val c = Canonicalize.canonicalMap(links, TranscriptGen.entities(spark)).cache()
        c.count(); c
      }
      time("materialize triples") {
        KGPipeline.materializeTriples(verified, relations, canon).count()
      }
      extracted.unpersist(); links.unpersist(); canon.unpersist()
    }
    spark.stop()
  }
}
