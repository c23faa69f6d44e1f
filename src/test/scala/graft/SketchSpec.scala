package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RelationalQueries

/** Gates the sketch estimators that q64_distinct_users cannot oracle
  * (DuckDB cannot reproduce their bits) against the exact distincts
  * it does oracle:
  *  - hll_sketch_agg / hll_sketch_estimate (Apache DataSketches,
  *    lgK=12 → RSE ~1.6%) within 3% of exact;
  *  - MERGEABILITY — the property that makes sketches the 100-TB
  *    shape: union of per-shard sketches (hll_union_agg) must agree
  *    with the single-pass sketch, so a pipeline can store a sketch
  *    per day/partition and re-aggregate without rescanning;
  *  - approx_count_distinct (HLL++, rsd=0.02) within 5% of exact;
  *  - approx_percentile within a rank-error band of the exact
  *    percentile (q44's estimator at scale).
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val events = spark.read.parquet(s"$dir/events.parquet")

  test("hll_sketch_agg estimate within 3% of exact per group, and merge of per-shard sketches agrees") {
    val direct = events.groupBy("event_type").agg(
      countDistinct(col("user_id")).as("exact"),
      expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est"))
    // per-shard sketches (8 disjoint user shards), then re-aggregate:
    val merged = events
      .groupBy(col("event_type"), pmod(col("user_id"), lit(8)).as("shard"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_merged"))
    val rows = direct.join(merged, "event_type").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val est = r.getAs[Long]("est").toDouble
      val estM = r.getAs[Long]("est_merged").toDouble
      assert(math.abs(est - exact) / exact < 0.03,
        s"${r.getString(0)}: hll est $est vs exact $exact")
      assert(math.abs(estM - exact) / exact < 0.03,
        s"${r.getString(0)}: merged est $estM vs exact $exact")
      assert(math.abs(estM - est) / exact < 0.02,
        s"${r.getString(0)}: merged $estM vs direct $est diverge")
    }
  }

  test("approx_count_distinct (HLL++) within 5% of exact per group") {
    val rows = events.groupBy("event_type").agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), rsd = 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("approx_percentile lands inside the exact p45..p55 rank band for p50") {
    val r = events.agg(
      expr("percentile(value, array(0.45D, 0.55D))").as("band"),
      expr("approx_percentile(value, 0.5D, 10000)").as("ap50"))
      .head()
    val band = r.getSeq[Double](0)
    val ap50 = r.getDouble(1)
    assert(ap50 >= band(0) && ap50 <= band(1),
      s"approx p50 $ap50 outside exact band [${band(0)}, ${band(1)}]")
  }

  test("q64 exact distincts match a driver-side recount") {
    val q = RelationalQueries.q64DistinctUsers(spark, dir)
      .orderBy("event_type").collect()
    val byType = events.select("event_type", "user_id").distinct()
      .groupBy("event_type").count().orderBy("event_type").collect()
    assert(q.map(_.getString(0)).sameElements(byType.map(_.getString(0))))
    q.zip(byType).foreach { case (a, b) =>
      assert(a.getAs[Long]("n_users") == b.getAs[Long]("count"))
    }
  }
}
