package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def text(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("packPlan: prefix-sum layout, straddling docs, independent streams") {
    import spark.implicits._
    val docs = Seq(
      ("a", 1L, text(300)), ("a", 2L, text(300)), ("a", 3L, text(100)),
      ("b", 10L, text(600))).toDF("source", "doc_id", "text")
    val plan = Packing.packPlan(docs, "source", "doc_id", "text", budget = 512)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // stream a: starts 0, 300, 600 -> seqs 0, 0, 1; offsets 0, 300, 88
    assert(plan(("a", 1L)) == ((300L, 0L, 0L, 0L)))
    assert(plan(("a", 2L)) == ((300L, 300L, 0L, 300L))) // straddles the 512 cut
    assert(plan(("a", 3L)) == ((100L, 600L, 1L, 88L)))
    // stream b packs independently from token 0
    assert(plan(("b", 10L)) == ((600L, 0L, 0L, 0L)))
  }

  test("packPlan is deterministic under repartition") {
    import spark.implicits._
    val docs = (1 to 100).map(i => (s"s${i % 4}", i.toLong, text(37 + i % 13)))
      .toDF("source", "doc_id", "text")
    val a = Packing.packPlan(docs, "source", "doc_id", "text", 128).collect().toSet
    val b = Packing.packPlan(docs.repartition(7), "source", "doc_id", "text", 128).collect().toSet
    assert(a == b)
  }
}
