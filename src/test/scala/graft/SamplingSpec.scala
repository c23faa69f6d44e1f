package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("stratifiedSample is deterministic, rate-accurate, and repartition-invariant") {
    import spark.implicits._
    val rows = (0 until 4000).map(i => (i.toLong, if (i % 2 == 0) "en" else "fr", s"doc body $i"))
    val df = rows.toDF("doc_id", "lang", "text")
    val rates = Map("en" -> 0.5, "fr" -> 0.125)
    val pick = Sampling.stratifiedSample(df, "lang", "text", rates, defaultRate = 0.0)
      .select("doc_id").as[Long].collect().toSet
    // deterministic: same result on a rerun and under a different layout
    val pick2 = Sampling.stratifiedSample(df.repartition(13), "lang", "text", rates, 0.0)
      .select("doc_id").as[Long].collect().toSet
    assert(pick == pick2)
    // rate-accurate within binomial noise (n=2000 per stratum)
    val en = pick.count(_ % 2 == 0).toDouble / 2000
    val fr = pick.count(_ % 2 == 1).toDouble / 2000
    assert(math.abs(en - 0.5) < 0.05, s"en rate $en")
    assert(math.abs(fr - 0.125) < 0.04, s"fr rate $fr")
  }

  test("stratifiedSample default rate applies to unlisted strata; rate 0 drops, 1 keeps") {
    import spark.implicits._
    val df = (0 until 300).map(i => (i.toLong, "xx", s"t$i")).toDF("doc_id", "lang", "text")
    assert(Sampling.stratifiedSample(df, "lang", "text", Map.empty, 0.0).count() == 0)
    assert(Sampling.stratifiedSample(df, "lang", "text", Map.empty, 1.0).count() == 300)
    val some = Sampling.stratifiedSample(df, "lang", "text", Map.empty, 0.25).count()
    assert(some > 30 && some < 120, s"default-rate count $some")
  }

  test("mixtureUpsample repeats by stratum factor, drops zero-factor strata") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("doc_id", "source")
    val out = Sampling.mixtureUpsample(df, "source", Map("a" -> 3, "b" -> 0, "c" -> 1), 2)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max("copy").as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out(1L) == ((3L, 3)))
    assert(!out.contains(2L))
    assert(out(3L) == ((1L, 1)))
    assert(out(4L) == ((2L, 2))) // default factor
  }

  test("sampling stays scan-shaped: filter with no shuffle") {
    import spark.implicits._
    val df = Seq((1L, "en", "t")).toDF("doc_id", "lang", "text")
    val plan = Sampling.stratifiedSample(df, "lang", "text", Map("en" -> 0.5), 0.1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
