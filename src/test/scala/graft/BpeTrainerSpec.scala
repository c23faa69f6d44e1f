package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BpeTrainer

class BpeTrainerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // the classic BPE walkthrough histogram: hug*10 pug*5 pun*12 bun*4 hugs*5
  private def corpus = {
    import spark.implicits._
    Seq((1L, (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
      Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")).mkString(" "))).toDF("doc_id", "text")
  }

  test("fit reproduces the hand-computed merge sequence") {
    // pair counts round 1: (u,g)=20 (u,n)=16 (h,u)=15 (p,u)=17? no:
    //   hug:10 (h,u)(u,g); pug:5 (p,u)(u,g); pun:12 (p,u)(u,n);
    //   bun:4 (b,u)(u,n); hugs:5 (h,u)(u,g)(g,s)
    //   (u,g)=20, (p,u)=17, (u,n)=16, (h,u)=15, (b,u)=4, (g,s)=5
    // merge1 = (u,g). round 2: (h,ug)=15, (p,ug)=5, (p,u)=12, (u,n)=16,
    //   (b,u)=4, (ug,s)=5 -> merge2 = (u,n).
    // round 3: (h,ug)=15 wins -> merge3 = (h,ug)
    val merges = BpeTrainer.fit(corpus, "text", nMerges = 3, maxVocab = 100)
    assert(merges.map(m => (m.left, m.right)) == Seq(("u", "g"), ("u", "n"), ("h", "ug")))
  }

  test("encodeWord applies merges in rank order; OOV chars stay singletons") {
    val merges = BpeTrainer.fit(corpus, "text", nMerges = 3, maxVocab = 100)
    assert(BpeTrainer.encodeWord("hug", merges) == Seq("hug"))
    assert(BpeTrainer.encodeWord("bug", merges) == Seq("b", "ug"))
    assert(BpeTrainer.encodeWord("hun", merges) == Seq("h", "un"))
    assert(BpeTrainer.encodeWord("zzz", merges) == Seq("z", "z", "z"))
    assert(BpeTrainer.encodeWord("", merges) == Seq.empty)
  }

  test("fit stops early when no pairs remain") {
    import spark.implicits._
    val tiny = Seq((1L, "a b")).toDF("doc_id", "text") // single-char words: zero pairs
    assert(BpeTrainer.fit(tiny, "text", nMerges = 5, maxVocab = 10).isEmpty)
  }

  test("distributed tokenCounts match driver-side encode") {
    import spark.implicits._
    val merges = BpeTrainer.fit(corpus, "text", nMerges = 3, maxVocab = 100)
    val docs = Seq((1L, "hug bug"), (2L, "pun hugs"), (3L, "")).toDF("doc_id", "text")
    val got = BpeTrainer.tokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1 + 2) // [hug] + [b, ug]
    assert(got(2L) == 2 + 2) // [p, un] + [hug, s]
    assert(got(3L) == 0)
  }
}
