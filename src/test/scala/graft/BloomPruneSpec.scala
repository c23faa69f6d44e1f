package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{BloomPrune, RelationalQueries}

/** BloomPrune = exactly a semi join (the bloom stage is shuffle-volume
  * reduction only), and the bloom stage actually prunes. */
class BloomPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val events = spark.read.parquet(s"$dir/events.parquet")

  test("bloom-pruned semi join ≡ plain left-semi join") {
    val keys = events.filter(col("event_type") === "purchase" && col("value") > 150.0)
      .select("user_id").distinct()
    val got = BloomPrune.semiJoinLong(events, "user_id", keys, "user_id", 1L << 20)
      .select("event_id").collect().map(_.getLong(0)).sorted
    val want = events.join(keys, Seq("user_id"), "left_semi")
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want))
    assert(got.nonEmpty)
  }

  test("disjoint key set: bloom filter alone rejects the overwhelming majority") {
    // keys far outside the user_id domain — every bloom pass-through is a
    // false positive, bounded by fpp (3% requested; assert a loose 20%)
    val keys = events.select((col("user_id") + 1000000L).as("user_id")).distinct()
    val bf = keys.stat.bloomFilter("user_id", 1L << 20, 0.03)
    val n = events.count().toDouble
    val passed = events.filter(udf((k: Long) => bf.mightContainLong(k)).apply(col("user_id"))).count()
    assert(passed / n < 0.2, s"bloom passed $passed of $n rows")
    // and the exact trailing join still yields the true (empty) result
    assert(BloomPrune.semiJoinLong(events, "user_id", keys, "user_id", 1L << 20).count() === 0L)
  }

  test("q65 matches its IN-subquery spelling in-engine") {
    val got = RelationalQueries.q65BloomPrune(spark, dir)
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1)))
    val want = events.filter(col("user_id").isin(
        events.filter(col("event_type") === "purchase" && col("value") > 150.0)
          .select("user_id").distinct().collect().map(_.getLong(0)).toSeq: _*))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(want))
  }
}
