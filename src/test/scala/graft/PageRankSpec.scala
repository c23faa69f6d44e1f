package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.kg.PageRank

/** PageRank gates: analytic fixtures (cycle = uniform), mass
  * conservation under dangling vertices, and agreement with an
  * independent dense driver-side power iteration on a seeded random
  * graph — in both fixed-iteration and converge-to-tol modes. */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def edgesDf(es: Seq[(String, String, Double)]) = {
    import spark.implicits._
    es.toDF("src", "dst", "weight")
  }

  private def collectRanks(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** Independent dense implementation (same dangling/damping
    * semantics), for cross-checking the distributed loop. */
  private def dense(es: Seq[(String, String, Double)], d: Double,
                    iters: Int): Map[String, Double] = {
    val verts = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = verts.size
    val wout = es.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var rank = verts.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val danglingMass = verts.filterNot(wout.contains).map(rank).sum
      val inflow = scala.collection.mutable.HashMap.empty[String, Double].withDefaultValue(0.0)
      es.foreach { case (s, t, w) => inflow(t) += w / wout(s) * rank(s) }
      rank = verts.map(v =>
        v -> ((1.0 - d) / n + d * (inflow(v) + danglingMass / n))).toMap
    }
    rank
  }

  test("cycle graph converges to the uniform distribution") {
    val es = (0 until 6).map(i => (s"v$i", s"v${(i + 1) % 6}", 1.0))
    val got = collectRanks(PageRank.run(edgesDf(es)))
    assert(got.size == 6)
    got.values.foreach(r => assert(math.abs(r - 1.0 / 6) < 1e-9, got))
  }

  test("dangling vertex: ranks stay a distribution (sum = 1)") {
    // c has no out-edges; its mass must redistribute, not vanish
    val es = Seq(("a", "b", 1.0), ("b", "c", 1.0))
    val got = collectRanks(PageRank.run(edgesDf(es), iterations = Some(10)))
    assert(math.abs(got.values.sum - 1.0) < 1e-12, got)
    assert(got("c") > got("a"), s"sink must accumulate rank: $got")
  }

  test("fixed-iteration mode matches the dense reference exactly") {
    val rnd = new scala.util.Random(7)
    val verts = (0 until 12).map(i => s"n$i")
    val es = (for {
      s <- verts; t <- verts if s != t && rnd.nextDouble() < 0.25
    } yield (s, t, 1.0 + rnd.nextInt(5).toDouble)).toSeq
    val got = collectRanks(PageRank.run(edgesDf(es), iterations = Some(5)))
    val want = dense(es, 0.85, 5)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-12, s"$v: $r vs ${want(v)}") }
  }

  test("convergence mode agrees with a long dense run and is ordered sensibly") {
    val es = Seq(
      ("hub", "a", 1.0), ("a", "hub", 1.0), ("b", "hub", 1.0), ("c", "hub", 1.0),
      ("b", "a", 1.0), ("c", "b", 1.0))
    // L1 delta decays ~d^k, so 1e-9 needs ≈ log(1e-9)/log(0.85) ≈ 130 rounds
    val got = collectRanks(PageRank.run(edgesDf(es), maxIter = 150, tol = 1e-9))
    val want = dense(es, 0.85, 400)
    got.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-7, s"$v: $r vs ${want(v)}") }
    assert(got("hub") == got.values.max, s"hub must rank highest: $got")
  }
}
