package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps
import graft.functions.TextAnalytics

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("langId identifies clear-cut samples") {
    assert(TextAnalytics.langId("the cat sat on the mat and it was happy with all of this") == "en")
    assert(TextAnalytics.langId("le chat est dans la maison avec les enfants et il est content") == "fr")
    assert(TextAnalytics.langId("der Hund ist in dem Haus und er ist mit den Kindern") == "de")
    assert(TextAnalytics.langId("el perro es grande y la casa es pequeña para los niños") == "es")
    assert(TextAnalytics.langId("xyzzy plugh qwop") == "und")
    assert(TextAnalytics.langId("") == "und")
  }

  test("quality scores order cleanly: prose > digit wall > empty") {
    val prose = TextAnalytics.quality(
      "The quarterly report shows that the teams have improved their results with better planning.")
    val digits = TextAnalytics.quality("3495 2383 9934 1123 4455 9982 3141 5926")
    val empty = TextAnalytics.quality("")
    assert(prose.score > digits.score)
    assert(digits.score >= empty.score)
    assert(prose.stopwordRatio > 0.2)
    assert(digits.digitRatio > 0.5)
  }

  test("winnowing fingerprints: shared passages share fingerprints") {
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val b = "PREFIX " + a + " SUFFIX" // same passage embedded
    val c = "completely different words that have nothing in common whatsoever here"
    val fa = TextAnalytics.winnow(a).toSet
    val fb = TextAnalytics.winnow(b).toSet
    val fc = TextAnalytics.winnow(c).toSet
    val overlapAB = fa.intersect(fb).size.toDouble / fa.size
    val overlapAC = fa.intersect(fc).size.toDouble / fa.size
    info(s"overlap a∩b=$overlapAB a∩c=$overlapAC")
    assert(overlapAB > 0.6)
    assert(overlapAC < 0.2)
  }

  test("profile runs over the driver documents table") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = TextOps.profile(docs, "doc_id", "text").cache()
    assert(p.count() == docs.count())
    val row = p.filter(_.doc_id == 0L).head()
    assert(row.n_chars > 0 && row.tok_ws > 0 && row.quality > 0)
    // deterministic simhash formatting
    assert(row.simhash_hex.length == 16)
  }

  test("qualityFilter keeps good docs, drops digit walls") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The quarterly report shows the teams have improved their results with better planning and the work was done."),
      (2L, "9934 1123 4455 9982 3141 5926 8979 3238 4626 4338"),
      (3L, "ok")).toDF("doc_id", "text")
    val kept = TextOps.qualityFilter(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("token counters: ws vs bpe-ish") {
    assert(TextAnalytics.tokenCountWs("a b  c") == 3)
    assert(TextAnalytics.tokenCountWs("") == 0)
    assert(TextAnalytics.tokenizeBpeIsh("don't stop123!") ==
      List("don", "'", "t", "stop", "123", "!"))
  }
}
