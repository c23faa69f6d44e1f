package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ann
import graft.functions.StringSim

class AnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val (vectors, queries) = {
    val rnd = new scala.util.Random(5)
    def randVec() = Array.fill(32)(rnd.nextGaussian().toFloat)
    val base = (0 until 300).map(i => (i.toLong, randVec()))
    // queries = noisy copies of vectors 0..9 → known true nearest neighbor
    val qs = (0 until 10).map { i =>
      (1000L + i, base(i)._2.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }
    (base, qs.toArray)
  }

  private def embDF = {
    import spark.implicits._
    vectors.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
  }

  private def bruteTruth(k: Int): Map[Long, Seq[Long]] =
    queries.map { case (qid, qv) =>
      qid -> vectors.map { case (id, v) => (id, StringSim.cosine(v, qv)) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSeq
    }.toMap

  test("bruteForceTopK matches local exact computation") {
    val got = Ann.bruteForceTopK(embDF, "vec_id", "embedding", queries, k = 5)
      .collect().groupBy(_.query_id)
      .map { case (q, ns) => q -> ns.sortBy(n => (-n.sim, n.vec_id)).map(_.vec_id).toSeq }
    val truth = bruteTruth(5)
    queries.foreach { case (qid, _) =>
      assert(got(qid) == truth(qid), s"query $qid: ${got(qid)} vs ${truth(qid)}")
    }
  }

  test("ivfTopK finds the true top-1 for near-duplicate queries (learned coarse quantizer)") {
    val got = Ann.ivfTopK(embDF, "vec_id", "embedding", queries, k = 5,
      nLists = 8, nProbe = 3, sampleSize = 300)
      .collect().groupBy(_.query_id)
    val hits = queries.count { case (qid, _) =>
      got.get(qid).exists(_.exists(_.vec_id == qid - 1000L))
    }
    info(s"ivf top-1 recall: $hits/10")
    assert(hits >= 8, s"only $hits/10 true neighbors found")
    // scores are exact cosines (rescored inside probed lists)
    got.values.flatten.foreach { n =>
      val expected = StringSim.cosine(
        vectors(n.vec_id.toInt)._2, queries.find(_._1 == n.query_id).get._2)
      assert(math.abs(n.sim - expected) < 1e-12)
    }
    // determinism: identical output across invocations
    val again = Ann.ivfTopK(embDF, "vec_id", "embedding", queries, k = 5,
      nLists = 8, nProbe = 3, sampleSize = 300).collect().toSet
    assert(again == got.values.flatten.toSet)
  }

  test("lshTopK finds the true top-1 for near-duplicate queries") {
    val got = Ann.lshTopK(embDF, "vec_id", "embedding", queries, k = 5)
      .collect().groupBy(_.query_id)
    val hits = queries.count { case (qid, _) =>
      got.get(qid).exists(_.exists(_.vec_id == qid - 1000L))
    }
    info(s"lsh top-1 recall: $hits/10")
    assert(hits >= 8, s"only $hits/10 true neighbors found")
    // scores are exact cosines (rescored, not approximated)
    got.values.flatten.foreach { n =>
      val expected = StringSim.cosine(
        vectors(n.vec_id.toInt)._2, queries.find(_._1 == n.query_id).get._2)
      assert(math.abs(n.sim - expected) < 1e-12)
    }
  }

  test("lshTopKWith(injected planes) ≡ local bucketed recomputation (the q37 oracle kernel)") {
    // the portable-matrix surface q37 oracles: same matrix here →
    // candidate set must be EXACTLY the hamming≤1 signature pairs,
    // ranked by half-up-rounded cosine then vec_id
    val mat = graft.operators.RelationalQueries.portablePlanes(6, 32)
    def bucket(v: Array[Float]): Int = {
      mat.zipWithIndex.foldLeft(0) { case (bits, (row, p)) =>
        val dot = row.indices.take(v.length).foldLeft(0.0)((a, j) => a + v(j) * row(j))
        if (dot >= 0) bits | (1 << p) else bits
      }
    }
    def q4(x: Double): Double = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val local = queries.flatMap { case (qid, qv) =>
      val qb = bucket(qv)
      vectors.filter { case (id, v) => id != qid && Integer.bitCount(bucket(v) ^ qb) <= 1 }
        .map { case (id, v) => (qid, id, q4(StringSim.cosine(v, qv))) }
        .sortBy { case (_, id, s) => (-s, id) }
        .take(5)
    }.toSet
    val got = Ann.lshTopKWith(embDF, "vec_id", "embedding", queries, k = 5,
      mat, probes = 7, simPrecision = 4)
      .collect().map(n => (n.query_id, n.vec_id, n.sim)).toSet
    assert(got == local, s"diff: ${(got diff local) ++ (local diff got)}")
  }

  test("ivfTopKWith(injected codebook) ≡ local inverted-list recomputation (the q40 oracle kernel)") {
    // the portable-codebook surface q40 oracles: cosine list
    // assignment rounded to 6 decimals before the argmax (tie → lower
    // list id), candidates = vectors whose single assigned list is
    // among the query's 3 probed lists, ranked by rounded cosine
    val cents = graft.operators.RelationalQueries.portablePlanes(8, 32)
    def quant(x: Double, p: Int): Double = BigDecimal(x).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cosFD(v: Array[Float], c: Array[Double]): Double = {
      val n = math.min(v.length, c.length)
      var dot = 0.0; var nv = 0.0; var nc = 0.0
      (0 until n).foreach { j => dot += v(j).toDouble * c(j); nv += v(j).toDouble * v(j); nc += c(j) * c(j) }
      if (nv == 0 || nc == 0) 0.0 else dot / math.sqrt(nv * nc)
    }
    def affs(v: Array[Float]) = cents.map(c => quant(cosFD(v, c), 6))
    def assigned(v: Array[Float]): Int = {
      val a = affs(v); a.indices.minBy(i => (-a(i), i))
    }
    val local = queries.flatMap { case (qid, qv) =>
      val probed = affs(qv).zipWithIndex.sortBy { case (a, c) => (-a, c) }.take(3).map(_._2).toSet
      vectors.filter { case (id, v) => id != qid && probed(assigned(v)) }
        .map { case (id, v) => (qid, id, quant(StringSim.cosine(v, qv), 4)) }
        .sortBy { case (_, id, s) => (-s, id) }
        .take(5)
    }.toSet
    val got = Ann.ivfTopKWith(embDF, "vec_id", "embedding", queries, k = 5,
      cents, nProbe = 3, assignPrecision = 6, simPrecision = 4)
      .collect().map(n => (n.query_id, n.vec_id, n.sim)).toSet
    assert(got == local, s"diff: ${(got diff local) ++ (local diff got)}")
  }
}
