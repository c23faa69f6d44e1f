package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Confidence
import graft.kg._

/** Gates for the logit-confidence suite: the six confidence functions
  * against numpy-computed fixture values (exact reference formulas,
  * evaluating_confidence.py:98-107), the distributed rank-sum AUC
  * against the sklearn value, and the pipeline logit stage's
  * confidence→correctness separation (the property the reference's
  * ROC analysis measures).
  */
class ConfidenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private def approx(a: Double, b: Double, eps: Double = 1e-10) = math.abs(a - b) < eps

  private val logits = Array(2.5, -1.0, 0.7)

  test("six confidence functions match the reference's numpy math exactly") {
    // fixture values computed with numpy from the reference's lambdas
    val sm = Array(0.836472704867, 0.025259286991, 0.138268008142)
    Seq("softmax", "softmax_min", "softmax_max").foreach { k =>
      val got = Confidence.All(k)(logits)
      sm.indices.foreach(i => assert(approx(got(i), sm(i), 1e-9), s"$k[$i]"))
    }
    val direct = Array(1.136363636364, -0.454545454545, 0.318181818182)
    val centered = Array(2.692307692308, -0.807692307692, 0.892307692308)
    direct.indices.foreach(i =>
      assert(approx(Confidence.probaDirect(logits)(i), direct(i), 1e-9), s"direct[$i]"))
    centered.indices.foreach(i =>
      assert(approx(Confidence.probaCentered(logits)(i), centered(i), 1e-9), s"centered[$i]"))
    assert(Confidence.transparent(logits).toSeq == logits.toSeq)
    // softmax variants are shift-invariant → all three agree
    assert(Confidence.softmax(logits).toSeq.zip(Confidence.softmaxMax(logits).toSeq)
      .forall { case (a, b) => approx(a, b) })
  }

  test("logisticScore = sigmoid(w·x + b)") {
    assert(approx(Confidence.logisticScore(Array(1.0, 2.0), Array(0.5, -0.25), 0.1),
      1.0 / (1.0 + math.exp(-(0.5 - 0.5 + 0.1)))))
    assert(Confidence.sigmoid(0.0) == 0.5)
  }

  test("aucRankSum matches sklearn roc_auc_score on a tie-heavy fixture") {
    import spark.implicits._
    val labels = Seq(1, 1, 0, 1, 0, 0, 1, 0, 1, 0, 0, 1, 1, 0).map(_ == 1)
    val scores = Seq(0.9, 0.8, 0.8, 0.7, 0.3, 0.55, 0.55, 0.2, 0.95, 0.1, 0.55, 0.4, 0.55, 0.9)
    val df = labels.zip(scores).toDF("label", "score")
    // sklearn.roc_auc_score == 0.714285714286 on this fixture
    assert(approx(kg.Metrics.aucRankSum(df, "label", "score"), 0.714285714286, 1e-9))
    // degenerate checks: perfect separation → 1.0; anti-separation → 0.0
    val perfect = Seq((true, 0.9), (true, 0.8), (false, 0.2), (false, 0.1)).toDF("label", "score")
    assert(approx(kg.Metrics.aucRankSum(perfect, "label", "score"), 1.0))
    val inverted = Seq((true, 0.1), (true, 0.2), (false, 0.8), (false, 0.9)).toDF("label", "score")
    assert(approx(kg.Metrics.aucRankSum(inverted, "label", "score"), 0.0))
    // all-equal scores → 0.5 (pure ties)
    val flat = Seq((true, 0.5), (false, 0.5), (true, 0.5), (false, 0.5)).toDF("label", "score")
    assert(approx(kg.Metrics.aucRankSum(flat, "label", "score"), 0.5))
    // single-class input → null AUC, never NaN/Infinity
    val onlyPos = Seq((true, 0.4), (true, 0.9)).toDF("label", "score")
    assert(kg.Metrics.aucFrame(onlyPos, "label", "score").head().isNullAt(0))
    // …and the scalar API degrades to NaN instead of NPE-ing on the null
    assert(kg.Metrics.aucRankSum(onlyPos, "label", "score").isNaN)
  }

  test("pipeline logit stage: both classes present, softmax confidence separates them") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cfg = TranscriptGen.Config(nConvs = 120)
    val extracted = Extraction.extractAll(
      Extraction.scoreMentions(
        Extraction.buildPrompts(TranscriptGen.transcripts(spark, cfg)), cfg), cfg)
    val ml = Extraction.withLogits(extracted, cfg).cache()
    val n = ml.count()
    val nWrong = ml.filter(!_.correct).count()
    assert(n > 500)
    assert(nWrong > 0 && nWrong < n / 2, s"wrong $nWrong of $n")
    // wrong-pick rate ≈ logitNoisePerMille
    assert(math.abs(nWrong.toDouble / n - cfg.logitNoisePerMille / 1000.0) < 0.05)
    // ROC separation on the softmax confidence (rounded → bounded groups)
    val pts = ml.toDF().select(col("correct").as("label"),
      round(col("conf_softmax"), 4).as("score"))
    val auc = kg.Metrics.aucRankSum(pts, "label", "score")
    assert(auc > 0.75, s"softmax confidence AUC $auc must separate correct from wrong")
    // outputted tag always carries the max logit
    ml.collect().foreach { m =>
      assert(m.logits.max == m.logits(kg.Scorer.TagVocab.indexOf(m.outputted_tag)))
      assert(approx(m.calibrated,
        Confidence.logisticScore(m.logits.toArray, Extraction.CalibrationWeights,
          Extraction.CalibrationBias)))
    }
    // deterministic across parallelism
    val again = Extraction.withLogits(extracted.repartition(17), cfg)
      .collect().map(m => (m.conv_id, m.turn_idx, m.mention, m.outputted_tag, m.conf_softmax)).toSet
    assert(again == ml.collect().map(m => (m.conv_id, m.turn_idx, m.mention, m.outputted_tag, m.conf_softmax)).toSet)
    ml.unpersist()
  }
}
