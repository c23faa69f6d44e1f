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

  test("weightedSample: exactly k per stratum, no duplicates, repartition-invariant") {
    import spark.implicits._
    val rows = (0 until 900).map(i => (i.toLong, s"s${i % 3}", s"body $i", 1L + i % 7))
    val df = rows.toDF("doc_id", "stratum", "text", "w")
    val got = Sampling.weightedSample(df, "stratum", "text", "w", "doc_id", 10)
      .select("stratum", "doc_id").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.length == 30 && got.distinct.length == 30)
    assert(got.groupBy(_._1).forall(_._2.length == 10))
    val got2 = Sampling.weightedSample(df.repartition(17), "stratum", "text", "w", "doc_id", 10)
      .select("stratum", "doc_id").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.sorted.sameElements(got2.sorted))
  }

  test("weightedSample favors heavy rows (Efraimidis-Spirakis bias)") {
    import spark.implicits._
    // 200 strata, each 1 heavy row (w=10000) + 20 light (w=10), k=1:
    // P(heavy wins a stratum) ≈ 10000/10200 — demand ≥80% overall
    val rows = (0 until 200).flatMap { s =>
      (("h", s"stratum$s", s"heavy text $s", 10000L)) +:
        (0 until 20).map(i => ("l", s"stratum$s", s"light text $s-$i", 10L))
    }
    val df = rows.toDF("kind", "stratum", "text", "w")
    val picked = Sampling.weightedSample(df, "stratum", "text", "w", "text", 1)
      .groupBy("kind").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(picked.getOrElse("h", 0L) >= 160, s"heavy picks: $picked")
  }
}
