package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixture for q70TfidfTerms (smoothed sklearn idf:
  * ln((N+1)/(df+1)) + 1, scores rounded to 6dp before ranking). */
class TfidfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("q70 tf-idf matches hand computation and ranks within doc") {
    import spark.implicits._
    val dir = SparkTestBase.scratchDir("graft-tfidf")
    Seq(
      ("d1", "apple apple banana"),
      ("d2", "banana cherry"),
      ("d3", "cherry cherry date apple"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = operators.RelationalQueries.q70TfidfTerms(spark, dir)
      .orderBy("doc_id", "term")
      .select("doc_id", "term", "tf", "df", "tfidf")
      .as[(String, String, Long, Long, Double)].collect()

    // N=3; idf(df=2) = ln(4/3)+1, idf(df=1) = ln(4/2)+1
    val idf2 = math.log(4.0 / 3.0) + 1.0 // 1.287682...
    val idf1 = math.log(2.0) + 1.0       // 1.693147...
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = Seq(
      ("d1", "apple", 2L, 2L, r6(2 * idf2)),
      ("d1", "banana", 1L, 2L, r6(idf2)),
      ("d2", "banana", 1L, 2L, r6(idf2)),
      ("d2", "cherry", 1L, 2L, r6(idf2)),
      ("d3", "apple", 1L, 2L, r6(idf2)),
      ("d3", "cherry", 2L, 2L, r6(2 * idf2)),
      ("d3", "date", 1L, 1L, r6(idf1)))
    assert(out.toSeq == expected)

    // rank order within d3: cherry (2.575364) > date (1.693147) > apple (1.287682)
    val d3 = operators.RelationalQueries.q70TfidfTerms(spark, dir)
      .where(col("doc_id") === "d3").orderBy(col("tfidf").desc)
      .select("term").as[String].collect().toSeq
    assert(d3 == Seq("cherry", "date", "apple"))
  }

  test("q70 keeps at most 5 terms per doc, cutting the lowest scores") {
    import spark.implicits._
    val dir = SparkTestBase.scratchDir("graft-tfidf5")
    // 7 distinct terms; "rare" terms appear only here, "the" everywhere
    Seq(
      ("big", "alpha beta gamma delta epsilon zeta the"),
      ("x1", "the"), ("x2", "the"), ("x3", "the"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val big = operators.RelationalQueries.q70TfidfTerms(spark, dir)
      .where(col("doc_id") === "big")
    assert(big.count() == 5)
    // the 6 rare terms tie on score; term-asc tiebreak keeps the first 5,
    // and "the" (df=4, lowest idf) plus "zeta" (6th alphabetically) are cut
    val kept = big.select("term").as[String].collect().toSet
    assert(kept == Set("alpha", "beta", "gamma", "delta", "epsilon"))
  }
}
