package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("bucketed matches exactly the points inside each interval, across bin edges") {
    import spark.implicits._
    val points = Seq(
      (1L, "u1", ts(100)),  // inside i1 [50, 150]
      (2L, "u1", ts(150)),  // boundary end -> inside (inclusive)
      (3L, "u1", ts(151)),  // just outside
      (4L, "u1", ts(50)),   // boundary start -> inside
      (5L, "u1", ts(7300)), // inside i2 [7250, 7350] which straddles the 7200 bin edge
      (6L, "u2", ts(100)),  // other key: no interval
      (7L, "u1", ts(7150))  // before i2, bin 0 vs interval starting bin 1... (7150 < 7250)
    ).toDF("event_id", "key", "ts")
    val intervals = Seq(
      ("u1", 11L, ts(50), ts(150)),
      ("u1", 12L, ts(7250), ts(7350)),
      ("u1", 13L, ts(7100), ts(7160)) // also straddles nothing; catches point 7
    ).toDF("key", "iid", "start_ts", "end_ts")
    val got = RangeJoin.bucketed(points, intervals, Seq("key"),
      "ts", "start_ts", "end_ts", binSeconds = 7200L)
      .select("event_id", "i_iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 11L), (2L, 11L), (4L, 11L), (5L, 12L), (7L, 13L)))
  }

  test("an interval longer than the bin matches points in every covered bin, once each") {
    import spark.implicits._
    val points = (0 until 50).map(i => (i.toLong, "k", ts(i * 1000L)))
      .toDF("event_id", "key", "ts")
    val intervals = Seq(("k", 1L, ts(2500), ts(41000))) // ~5.3 bins at 7200s
      .toDF("key", "iid", "start_ts", "end_ts")
    val rows = RangeJoin.bucketed(points, intervals, Seq("key"),
      "ts", "start_ts", "end_ts", binSeconds = 7200L)
      .select("event_id").as[Long].collect()
    val expect = (0 until 50).filter(i => i * 1000L >= 2500 && i * 1000L <= 41000).map(_.toLong)
    assert(rows.sorted.toSeq == expect) // no duplicates, no misses
  }

  test("plan is an equi-join on (key, bin): no cartesian, no nested loop") {
    import spark.implicits._
    val points = (0 until 100).map(i => (i.toLong, s"u${i % 5}", ts(i * 100L)))
      .toDF("event_id", "key", "ts")
    val intervals = (0 until 20).map(i => (s"u${i % 5}", i.toLong, ts(i * 400L), ts(i * 400L + 900L)))
      .toDF("key", "iid", "start_ts", "end_ts")
    val plan = RangeJoin.bucketed(points, intervals, Seq("key"),
      "ts", "start_ts", "end_ts", binSeconds = 1000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
  }
}
