package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.UnigramLM

class UnigramLMSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("scoreDocs: hand-computed Laplace-smoothed means, OOV bucket") {
    import spark.implicits._
    // counts: a=3, b=1, c=1; total=5; maxVocab=2 -> vocab {a, b}
    // (tie at n=1 broken word-asc), V=2, denom=8
    // lp(a)=ln(4/8), lp(b)=ln(2/8), OOV c -> ln(1/8)
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = UnigramLM.scoreDocs(docs, "doc_id", "text", maxVocab = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val lnH = math.log(0.5)
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - (2 * lnH + math.log(0.25)) / 3) < 1e-5)
    assert(out(2L)._1 == 2L)
    assert(math.abs(out(2L)._2 - (lnH + math.log(0.125)) / 2) < 1e-5)
  }

  test("repetitive gibberish scores below typical prose (the filter signal)") {
    import spark.implicits._
    val prose = (1 to 8).map(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog near house $i"))
    val weird = Seq((99L, "zzyzx qwfp vexing jumble kraken blorp")) // all rare/OOV words
    val docs = (prose ++ weird).toDF("doc_id", "text")
    val out = UnigramLM.scoreDocs(docs, "doc_id", "text", maxVocab = 32)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val proseMean = prose.map(p => out(p._1)).sum / prose.size
    assert(out(99L) < proseMean, s"oov doc ${out(99L)} should score below prose $proseMean")
  }

  test("model scoring join is a broadcast (scan never shuffles for the lookup)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = UnigramLM.scoreDocs(docs, "doc_id", "text", maxVocab = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast model join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected sort-merge join in:\n$plan")
  }
}
