package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{GraftExtensions, JaroWinklerExpression}

/** The native codegen'd jaro_winkler expression: parity with the
  * scalar kernel, null contract, plan quality (no ScalaUDF node),
  * and the SparkSessionExtensions injection path. */
class JaroWinklerExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("expression ≡ StringSim.jaroWinkler on fixtures and fuzz strings") {
    import spark.implicits._
    JaroWinklerExpression.register(spark)
    val rnd = new scala.util.Random(42)
    val fuzz = Seq.fill(300)(
      (rnd.alphanumeric.take(rnd.nextInt(12)).mkString,
        rnd.alphanumeric.take(rnd.nextInt(12)).mkString))
    val pairs = (Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"),
      ("DIXON", "DICKSONX"), ("", ""), ("a", ""), ("abc", "abc")) ++ fuzz)
      .toDF("a", "b")
    val got = pairs.select(col("a"), col("b"), expr("jaro_winkler(a, b)").as("jw"))
      .as[(String, String, Double)].collect()
    got.foreach { case (a, b, jw) =>
      assert(jw == functions.StringSim.jaroWinkler(a, b), s"($a, $b)")
    }
  }

  test("null inputs yield null (BinaryExpression null-safe contract)") {
    import spark.implicits._
    JaroWinklerExpression.register(spark)
    val r = Seq((Option("x"), Option.empty[String]), (None, Option("y")))
      .toDF("a", "b")
      .select(expr("jaro_winkler(a, b)").as("jw"))
      .as[Option[Double]].collect()
    assert(r.forall(_.isEmpty))
  }

  test("q15 plan: codegen'd expression, no ScalaUDF / BatchEval node") {
    val df = operators.RelationalQueries.q15JaroLink(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), p.take(800))
    assert(p.contains("jaro_winkler"), p.take(800))
  }

  test("cosine_sim expression ≡ the higher-order aggregate/zip_with chain, bit-exact") {
    import spark.implicits._
    graft.plans.CosineSimilarityExpression.register(spark)
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(200)((
      Array.fill(16)(rnd.nextDouble() * 2 - 1),
      Array.fill(16)(rnd.nextDouble() * 2 - 1)))
    val df = vecs.toDF("a", "b")
    val got = df.select(
      expr("cosine_sim(a, b)").as("native"),
      (expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, w) -> acc + w)") /
        sqrt(expr("aggregate(a, 0D, (acc, w) -> acc + w * w)") *
          expr("aggregate(b, 0D, (acc, w) -> acc + w * w)"))).as("hof"))
      .as[(Double, Double)].collect()
    got.foreach { case (n, h) => assert(n == h) } // bit-exact, no tolerance
    // zero-norm → NaN on both spellings
    val z = Seq((Array(0.0, 0.0), Array(1.0, 2.0))).toDF("a", "b")
      .select(expr("cosine_sim(a, b)")).as[Double].head()
    assert(z.isNaN)
  }

  test("GraftExtensions injects the function builder without error") {
    // building a fully-configured session would collide with the
    // shared test session; exercising the injection closure against a
    // fresh extensions object still executes the production wiring
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions())
    // and the builder itself constructs the expression
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = JaroWinklerExpression.builder(Seq(Literal("MARTHA"), Literal("MARHTA")))
    assert(e.isInstanceOf[JaroWinklerExpression])
    intercept[IllegalArgumentException] {
      JaroWinklerExpression.builder(Seq(Literal("x")))
    }
  }
}
