package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("asOfJoin picks the greatest right ts <= left ts per key, inclusive; no match -> nulls") {
    import spark.implicits._
    val left = Seq(
      (1L, "a", ts(100)), // after r@50 and r@100 -> matches r@100 (inclusive)
      (2L, "a", ts(99)),  // between r@50 and r@100 -> r@50
      (3L, "a", ts(10)),  // before any right row -> null
      (4L, "b", ts(500)), // other key -> its own right row r@400
      (5L, "c", ts(500))  // key with no right rows at all -> null
    ).toDF("event_id", "key", "ts")
    val right = Seq(
      ("a", ts(50), 950L), ("a", ts(100), 910L), ("a", ts(101), 999L),
      ("b", ts(400), 940L)
    ).toDF("key", "ts", "marker")
    val got = AsOf.asOfJoin(left, right, Seq("key"), "ts")
      .select("event_id", "r_marker").as[(Long, Option[Long])]
      .collect().toMap
    assert(got == Map(1L -> Some(910L), 2L -> Some(950L), 3L -> None,
      4L -> Some(940L), 5L -> None))
  }

  test("asOfJoin preserves left cardinality and carries the matched right ts") {
    import spark.implicits._
    val left = (1 to 200).map(i => (i.toLong, (i % 7).toString, ts(i * 10L)))
      .toDF("event_id", "key", "ts")
    val right = (1 to 30).map(i => ((i % 7).toString, ts(i * 53L), i.toLong))
      .toDF("key", "ts", "marker")
      .groupBy("key", "ts").agg(org.apache.spark.sql.functions.min("marker").as("marker"))
    val out = AsOf.asOfJoin(left, right, Seq("key"), "ts")
    assert(out.count() == 200)
    // every matched r_ts is <= its row's ts, and is the max such per key
    val rights = right.as[(String, java.sql.Timestamp, Long)].collect()
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(r => (r._2.getTime, r._3)) }
    out.select("event_id", "key", "ts", "r_ts", "r_marker")
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp], Option[Long])]
      .collect().foreach { case (id, k, t, rt, rm) =>
        val expect = rights.getOrElse(k, Array.empty[(Long, Long)])
          .filter(_._1 <= t.getTime).sortBy(_._1).lastOption
        assert(rt.map(_.getTime) == expect.map(_._1), s"row $id")
        assert(rm == expect.map(_._2), s"row $id")
      }
  }
}
