package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kg._

class MetricsSpec extends AnyFunSuite {
  private def approx(a: Double, b: Double, eps: Double = 1e-9) = math.abs(a - b) < eps

  test("weighted P/R/F1 matches sklearn hand-computed example") {
    // y_true = [PER, PER, ORG, None], y_pred = [PER, ORG, ORG, PER]
    val counts = Seq(
      ("PER", "PER", 1L), ("PER", "ORG", 1L), ("ORG", "ORG", 1L), ("None", "PER", 1L))
    val prf = Metrics.prfFromCounts(counts)
    assert(approx(prf.precision, 0.375))
    assert(approx(prf.recall, 0.5))
    assert(approx(prf.f1, (2 * 0.5 + 1 * (2.0 / 3.0)) / 4))
    assert(prf.support == 4)
  }

  test("zero_division=0: label predicted never / gold never") {
    // gold has LOC never predicted; MISC predicted but absent from gold
    val counts = Seq(("LOC", "MISC", 2L))
    val prf = Metrics.prfFromCounts(counts)
    assert(prf.precision == 0.0 && prf.recall == 0.0 && prf.f1 == 0.0)
    assert(prf.support == 2)
  }

  test("perfect prediction → 1.0") {
    val prf = Metrics.prfFromCounts(Seq(("PER", "PER", 5L), ("ORG", "ORG", 3L)))
    assert(prf.precision == 1.0 && prf.recall == 1.0 && prf.f1 == 1.0)
  }

  test("alignment reproduces get_metrics_all dict-merge semantics") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    // turn 0: pred {A:PER} gold {A:PER, B:ORG} → rows (PER,PER), (ORG,None)
    // turn 1: pred {C:LOC} gold {} → row (None,LOC)
    val pred = Seq(Mention("c", 0, "A", "PER"), Mention("c", 1, "C", "LOC")).toDS()
    val gold = Seq(Mention("c", 0, "A", "PER"), Mention("c", 0, "B", "ORG")).toDS()
    val rows = Metrics.align(pred, gold).collect().sorted
    assert(rows.toSeq == Seq(("None", "LOC"), ("ORG", "None"), ("PER", "PER")))
  }

  test("confusionFrame ≡ weightedPRF's count matrix; WeightedF1Agg agrees distributed") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val pairs = Seq(
      ("PER", "PER"), ("PER", "ORG"), ("ORG", "ORG"), ("None", "PER"),
      ("PER", "PER"), ("LOC", "None"), ("None", "None")).toDS().repartition(3)
    val cm = Metrics.confusionFrame(pairs).as[(String, String, Long)].collect()
    assert(cm.map(_._3).sum == 7)
    assert(cm.map { case (t, p, n) => ((t, p), n) }.toMap.apply(("PER", "PER")) == 2)
    val fromFrame = Metrics.prfFromCounts(cm.toIndexedSeq)
    val direct = Metrics.weightedPRF(pairs)
    assert(fromFrame == direct)
    // the distributed Aggregator reaches the same weighted F1
    val f1Agg = pairs.select((new Metrics.WeightedF1Agg).toColumn).head()
    assert(approx(f1Agg, direct.f1))
  }

  test("t confidence interval") {
    val (mean, lo, hi) = Metrics.tConfidenceInterval(Seq(0.4, 0.5, 0.6))
    assert(approx(mean, 0.5))
    assert(lo < 0.5 && hi > 0.5)
    assert(approx(hi - mean, 4.303 * 0.1 / math.sqrt(3), 1e-6))
  }
}
