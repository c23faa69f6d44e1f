package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the evaluation-metric queries q83-q87
  * (Cohen's kappa, reliability bins, proper scoring rules, lexical
  * diversity, retrieval MRR). */
class EvalMetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q83 Cohen's kappa matches the hand-computed po/pe on a tiny rating table") {
    import spark.implicits._
    val dir = SparkTestBase.scratchDir("graft-kappa")
    // r2 derivation: id%7==0 -> click, id%11==0 -> error, else r1.
    // ids 1,2,3 (view, agree), 7 (view -> click, disagree),
    // 11 (click -> error, disagree), 14 (click -> click, AGREE via the 7-rule)
    Seq((1L, "view"), (2L, "view"), (3L, "view"),
      (7L, "view"), (11L, "click"), (14L, "click"))
      .toDF("event_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val Array(row) = operators.RelationalQueries.q83CohensKappa(spark, dir)
      .as[(Double, Double, Double)].collect()
    // r1 marginals: view 4, click 2; r2: view 3, click 2, error 1
    val po = 4.0 / 6.0
    val pe = (4.0 * 3 + 2.0 * 2 + 0.0 * 1) / 36.0
    assert(row == ((r6(po), r6(pe), r6((po - pe) / (1 - pe)))))
  }

  test("q84/q85 calibration bins, ECE, Brier and log loss match hand computation") {
    import spark.implicits._
    val dir = SparkTestBase.scratchDir("graft-calib")
    // p = frac(value); outcomes: purchase=1 else 0
    val rows = Seq( // (value, type) -> (p, y)
      (3.95, "purchase"), (0.85, "purchase"), (1.80, "view"),
      (2.15, "view"), (9.05, "view"), (4.12, "purchase"))
    rows.toDF("value", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ps = rows.map { case (v, _) => v - math.floor(v) }
    val ys = rows.map { case (_, t) => if (t == "purchase") 1.0 else 0.0 }

    val bins = operators.RelationalQueries.q84CalibrationBins(spark, dir)
      .orderBy("bin").as[(Long, Long, Double, Double, Double)].collect().toSeq
    def binOf(p: Double) = math.min(math.floor(p * 10), 9.0).toLong
    val byBin = ps.zip(ys).groupBy { case (p, _) => binOf(p) }.toSeq.sortBy(_._1)
    val expected = byBin.map { case (b, g) =>
      val (cp, cy) = (g.map(_._1).sum / g.size, g.map(_._2).sum / g.size)
      (b, g.size.toLong, r6(cp), r6(cy), r6(math.abs(cp - cy)))
    }
    assert(bins == expected)

    val Array((brier, logloss, ece)) =
      operators.RelationalQueries.q85ScoringRules(spark, dir)
        .as[(Double, Double, Double)].collect()
    val eb = ps.zip(ys).map { case (p, y) => (p - y) * (p - y) }.sum / ps.size
    val el = ps.zip(ys).map { case (p, y) =>
      -(y * math.log(math.max(p, 1e-15)) +
        (1 - y) * math.log(math.max(1 - p, 1e-15)))
    }.sum / ps.size
    val ee = byBin.map { case (_, g) =>
      g.size * math.abs(g.map(_._1).sum / g.size - g.map(_._2).sum / g.size)
    }.sum / ps.size
    assert(brier == r6(eb)); assert(math.abs(logloss - el) < 2e-6)
    assert(ece == r6(ee))
  }

  test("q86 lexical stats: entropy via the moment identity, ttr, counts") {
    import spark.implicits._
    val dir = SparkTestBase.scratchDir("graft-lexstats")
    Seq(("d1", "a a b"), ("d2", "x y z w"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.RelationalQueries.q86LexicalStats(spark, dir)
      .orderBy("doc_id").as[(String, Long, Long, Double, Double)].collect().toSeq
    // d1: H = ln3 - (2 ln2)/3 ; d2: uniform over 4 -> ln4
    assert(out == Seq(
      ("d1", 3L, 2L, r6(2.0 / 3), r6(math.log(3) - 2 * math.log(2) / 3)),
      ("d2", 4L, 4L, 1.0, r6(math.log(4)))))
  }

  test("q92 logistic GD matches a local implementation of the same 3 iterations") {
    import spark.implicits._
    val dir = SparkTestBase.scratchDir("graft-loggd")
    val rows = Seq(
      (3.95, "purchase"), (0.85, "purchase"), (1.80, "view"),
      (2.15, "view"), (9.05, "view"), (4.12, "purchase"), (7.33, "click"))
    rows.toDF("value", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val xs = rows.map { case (v, _) => v - math.floor(v) }
    val ys = rows.map { case (_, t) => if (t == "purchase") 1.0 else 0.0 }
    var (w1, w0) = (0.0, 0.0)
    def sig(x: Double) = 1.0 / (1.0 + math.exp(-(w1 * x + w0)))
    for (_ <- 1 to 3) {
      val g1 = xs.zip(ys).map { case (x, y) => (sig(x) - y) * x }.sum / xs.size
      val g0 = xs.zip(ys).map { case (x, y) => sig(x) - y }.sum / xs.size
      w1 -= g1; w0 -= g0
    }
    val ll = xs.zip(ys).map { case (x, y) =>
      val p = sig(x)
      -(y * math.log(math.max(p, 1e-15)) + (1 - y) * math.log(math.max(1 - p, 1e-15)))
    }.sum / xs.size
    val Array((sw1, sw0, sll)) = operators.RelationalQueries.q92LogisticGd(spark, dir)
      .as[(Double, Double, Double)].collect()
    assert(sw1 == r6(w1) && sw0 == r6(w0))
    assert(math.abs(sll - ll) < 1e-6)
    // the learned slope separates the classes in the fixture's favor:
    // purchases sit at higher frac(value) on average here
    assert(sw1 != 0.0)
  }

  test("q87 retrieval MRR: first same-label hit sets rr, top-10 hits counted") {
    import spark.implicits._
    val dir = SparkTestBase.scratchDir("graft-mrr")
    // query 0 (label 1). Candidates by cosine to (1,0):
    // 20:(1,0) l0 sim 1.0 ; 21:(1,1)/sqrt2 l1 sim .7071 ; 22:(0,1) l1 sim 0
    Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (20L, Array(1.0f, 0.0f), 0),
      (21L, Array(1.0f, 1.0f), 1),
      (22L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = operators.RelationalQueries.q87RetrievalMrr(spark, dir)
      .as[(Long, Int, Long, Double)].collect().toSeq
    // rank 1 = vec 20 (label 0), rank 2 = vec 21 (label 1) -> rr = 1/2
    assert(out == Seq((0L, 1, 2L, 0.5)))
  }
}
