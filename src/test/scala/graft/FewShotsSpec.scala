package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kg.FewShots
import graft.functions.StringSim

class FewShotsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val rnd = new scala.util.Random(3)
  private def vec() = Array.fill(16)(rnd.nextGaussian().toFloat)

  test("sentenceKnn matches local top-k (few_shots_techniques.py:71-81)") {
    import spark.implicits._
    val train = (0 until 50).map(i => (i.toLong, vec())).toArray
    val queries = (100 until 105).map(i => (i.toLong, vec()))
    val got = FewShots.sentenceKnn(queries.toDS(), train, k = 3)
      .collect().groupBy(_.query_id)
      .map { case (q, shots) => q -> shots.sortBy(_.rank).map(_.train_id).toSeq }
    queries.foreach { case (qid, qv) =>
      val expected = train.map { case (tid, tv) => (tid, StringSim.cosine(qv, tv)) }
        .sortBy { case (tid, s) => (-s, tid) }.take(3).map(_._1).toSeq
      assert(got(qid) == expected, s"query $qid")
    }
  }

  test("sentenceKnnJoin (distributed DataFrame form) ≡ typed sentenceKnn") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val train = (0 until 60).map(i => (i.toLong, vec())).toArray
    val queries = (100 until 106).map(i => (i.toLong, vec()))
    val poolDf = train.toSeq.toDF("vec_id", "evec")
      .select(col("vec_id"), col("evec").cast("array<double>").as("evec"))
    val qDf = queries.toDF("query_id", "qvec")
      .select(col("query_id"), col("qvec").cast("array<double>").as("qvec"))
    val joined = FewShots.sentenceKnnJoin(qDf, poolDf, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.sortBy(_._3).map(_._2).toSeq }
    val typed = FewShots.sentenceKnn(queries.toDS(), train, k = 3)
      .collect().groupBy(_.query_id)
      .map { case (q, shots) => q -> shots.sortBy(_.rank).map(_.train_id).toSeq }
    // identical neighbor ids per query (4-decimal rounding cannot flip
    // an order on gaussian vectors at these magnitudes — and if it ever
    // tie-broke, both engines break ties the same way)
    assert(joined == typed)
  }

  test("entityKnn merges per-token hits, dedups by train idx (py:110-124)") {
    import spark.implicits._
    val trainTokens = (0 until 40).map(i => ((i / 4).toLong, vec())).toArray // 10 rows × 4 tokens
    val qTokens = (0 until 3).map(p => (7L, p, vec()))
    val got = FewShots.entityKnn(qTokens.toDS(), trainTokens, k = 4)
      .collect().sortBy(_.rank)
    assert(got.length == 4)
    assert(got.map(_.train_id).distinct.length == 4) // deduped rows
    assert(got.map(_.sim).sorted.reverse.toSeq == got.map(_.sim).toSeq) // score-desc
    // best per train row = max over its token sims vs any query token
    val expectBest = trainTokens.groupBy(_._1).map { case (idx, toks) =>
      idx -> (for { (_, tv) <- toks; (_, _, qv) <- qTokens }
        yield StringSim.cosine(qv, tv)).max
    }
    got.foreach { s => assert(math.abs(s.sim - expectBest(s.train_id)) < 1e-12) }
  }

  test("entityKnnJoin (distributed DataFrame form) ≡ typed entityKnn") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val trainTokens = (0 until 48).map(i => ((i / 4).toLong, vec())).toArray // 12 rows × 4 tokens
    val qTokens = (0 until 9).map(i => ((i % 3).toLong, i, vec())) // 3 queries × 3 tokens
    val trDf = trainTokens.toSeq.toDF("train_id", "tvec")
      .select(col("train_id"), col("tvec").cast("array<double>").as("tvec"))
    val qDf = qTokens.toDF("query_id", "token_pos", "qvec")
      .select(col("query_id"), col("token_pos").cast("long").as("token_pos"),
        col("qvec").cast("array<double>").as("qvec"))
    val joined = FewShots.entityKnnJoin(qDf, trDf, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.sortBy(_._3).map(_._2).toSeq }
    val typed = FewShots.entityKnn(qTokens.toDS(), trainTokens, k = 3)
      .collect().groupBy(_.query_id)
      .map { case (q, shots) => q -> shots.sortBy(_.rank).map(_.train_id).toSeq }
    // same neighbor rows in the same rank order per query (4-decimal
    // rounding cannot flip a gaussian-vector order at these magnitudes;
    // the tie-break is (sim DESC, train_id ASC) in both arms)
    assert(joined == typed)
  }
}
