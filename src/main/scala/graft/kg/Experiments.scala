package graft.kg

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Experiment bookkeeping: the Spark re-expression of the reference's
  * ResultInstance store + leaderboard
  * (ner/llm_ner/ResultInstance.py:63-145, plot_results.py:10-35) and
  * the per-stage metrics table the north rule requires.
  */
object Experiments {

  /** One experiment run's score row (what a ResultInstance pickle
    * holds after re-scoring, ResultInstance.py:32-61). */
  final case class RunScore(
      model: String,
      technique: String,
      nb_few_shots: Int,
      run_idx: Int,
      f1: Double,
      precision: Double,
      recall: Double,
      elapsed_sec: Double)

  /** Leaderboard with Student-t 95% CIs per config, sorted by mean F1
    * descending (ResultInstance.py:75-87,145 + ner/utils.py:92-118).
    * The groupBy is distributed; the t-quantile is applied on the
    * per-config aggregates. */
  def leaderboard(runs: Dataset[RunScore]): DataFrame = {
    val spark = runs.sparkSession
    import spark.implicits._
    runs.groupByKey(r => (r.model, r.technique, r.nb_few_shots))
      .mapGroups { (key: (String, String, Int), it: Iterator[RunScore]) =>
        val f1s = it.map(_.f1).toSeq
        val (mean, lo, hi) = Metrics.tConfidenceInterval(f1s)
        (key._1, key._2, key._3, f1s.length, mean, lo, hi)
      }
      .toDF("model", "technique", "nb_few_shots", "n_runs", "f1_mean", "ci_low", "ci_high")
      .orderBy(col("f1_mean").desc)
  }

  /** Run the pipeline collecting per-stage row counts + wall times
    * into StageMetric rows (north rule: every stage writes lineage +
    * metrics). Each count is an extra action — use for audited runs,
    * not the hot path. */
  def runWithMetrics(spark: SparkSession, turns: Dataset[Turn],
                     cfg: TranscriptGen.Config, runId: String): (KGPipeline.Result, Dataset[StageMetric]) = {
    import spark.implicits._
    val metrics = Vector.newBuilder[StageMetric]
    def staged[T](stage: String, rowsIn: Long)(f: => (T, Long)): T = {
      val t0 = System.nanoTime()
      val (r, rowsOut) = f
      metrics += StageMetric(runId, stage, rowsIn, rowsOut,
        math.max(0L, rowsIn - rowsOut), (System.nanoTime() - t0) / 1000000L)
      r
    }

    val nTurns = turns.count()
    val prompts = staged("prompts", nTurns) {
      val p = Extraction.buildPrompts(turns).cache(); (p, p.count())
    }
    val nPrompts = prompts.count()
    val extracted = staged("extract", nPrompts) {
      val e = Extraction.extractAll(Extraction.scoreMentions(prompts, cfg), cfg).cache()
      (e, e.count())
    }
    val mentions = extracted.flatMap(e =>
      e.parsed.map { case (m, t) => Mention(e.conv_id, e.turn_idx, m, t) })
    val nMentions = mentions.count()
    val verified = extracted.flatMap(e =>
      e.verified.map { case (m, t) => Mention(e.conv_id, e.turn_idx, m, t) })
    staged[Unit]("verify", nMentions) { ((), verified.count()) }
    val relations = extracted.flatMap(e =>
      e.relations.map { case (s, p, o) => Relation(e.conv_id, e.turn_idx, s, p, o) })
    val links = staged("link", verified.count()) {
      val l = EntityLinking.link(verified, Lexicon.catalogue.toArray).cache()
      (l, l.count())
    }
    val canon = staged("canonicalize", links.count()) {
      val c = Canonicalize.canonicalMap(links, TranscriptGen.entities(spark)).cache()
      (c, c.count())
    }
    val triples = staged("materialize", verified.count() + relations.count()) {
      val t = KGPipeline.materializeTriples(verified, relations, canon)
      (t, t.count())
    }
    val result = KGPipeline.Result(turns, prompts, mentions, verified, relations,
      links, canon, triples, extracted)
    (result, spark.createDataset(metrics.result()))
  }
}
