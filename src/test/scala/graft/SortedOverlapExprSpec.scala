package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.SortedOverlapExpression

/** The native codegen'd sorted_overlap merge kernel (r6, the q94
  * verify hot path): parity with size(array_intersect) on sorted
  * duplicate-free arrays, the null contract, and the q94 rewrite's
  * end-to-end equality against the generic-expression spelling. */
class SortedOverlapExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("sorted_overlap ≡ size(array_intersect) on sorted distinct fuzz arrays") {
    import spark.implicits._
    SortedOverlapExpression.register(spark)
    val rnd = new scala.util.Random(11)
    def arr(): Array[String] =
      Array.fill(rnd.nextInt(40))(s"w${rnd.nextInt(60)}").distinct.sorted
    val rows = Seq.fill(400)((arr(), arr())) ++
      Seq((Array.empty[String], Array("a", "b")), (Array.empty[String], Array.empty[String]))
    val got = rows.toDF("a", "b")
      .select(expr("sorted_overlap(a, b)").as("native"),
        size(array_intersect(col("a"), col("b"))).as("generic"))
      .as[(Int, Int)].collect()
    got.foreach { case (n, g) => assert(n == g) }
  }

  test("long-array variant ≡ size(array_intersect) on sorted distinct fuzz arrays") {
    import spark.implicits._
    SortedOverlapExpression.register(spark)
    val rnd = new scala.util.Random(13)
    def arr(): Array[Long] =
      Array.fill(rnd.nextInt(50))(rnd.nextInt(80).toLong).distinct.sorted
    val rows = Seq.fill(400)((arr(), arr())) ++
      Seq((Array.empty[Long], Array(1L, 2L)), (Array.empty[Long], Array.empty[Long]))
    val got = rows.toDF("a", "b")
      .select(expr("sorted_overlap(a, b)").as("native"),
        size(array_intersect(col("a"), col("b"))).as("generic"))
      .as[(Int, Int)].collect()
    got.foreach { case (n, g) => assert(n == g) }
  }

  test("null inputs yield null (BinaryExpression null-safe contract)") {
    import spark.implicits._
    SortedOverlapExpression.register(spark)
    val r = Seq((Option(Seq("x")), Option.empty[Seq[String]]),
      (Option.empty[Seq[String]], Option(Seq("y"))))
      .toDF("a", "b")
      .select(expr("sorted_overlap(a, b)").as("o"))
      .as[Option[Int]].collect()
    assert(r.forall(_.isEmpty))
  }

  test("q94 rewrite ≡ the array_intersect spelling it replaced (sf0.001)") {
    val got = operators.RelationalQueries
      .q94SimilarityJoin(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    // independent re-derivation with generic expressions only
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(pmod(col("doc_id"), lit(4)) === 0)
      .select(col("doc_id"), array_distinct(
        filter(split(lower(col("text")), "[^a-z]+"), w => w =!= lit(""))).as("ts"))
      .localCheckpoint()
    val want = d.select(col("doc_id").as("a"), col("ts").as("ta"))
      .crossJoin(d.select(col("doc_id").as("b"), col("ts").as("tb")))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        (size(array_intersect(col("ta"), col("tb"))).cast("double") /
          (size(col("ta")) + size(col("tb")) -
            size(array_intersect(col("ta"), col("tb"))))).as("j"))
      .where(col("j") >= 0.9)
      .select(col("a"), col("b"), round(col("j"), 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(got.toSeq == want.toSeq)
  }
}
