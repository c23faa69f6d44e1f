package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join — match point rows to interval rows
  * on a key plus `start ≤ ts ≤ end`, without the naive spelling's
  * equi-join-then-filter-free cartesian (Spark turns a bare range
  * predicate into BroadcastNestedLoopJoin/CartesianProduct: every
  * point × every interval of the key — quadratic, and a non-starter
  * at 100 TB).
  *
  * The classic fix: quantize time into fixed-width bins no narrower
  * than the longest interval, explode each interval onto every bin it
  * overlaps, map each point to its single bin, then a plain
  * shuffle-hash EQUI-join on (key, bin) followed by the exact range
  * filter. Each point meets each interval at most once (the point has
  * ONE bin; the interval's exploded bins are distinct), so no dedup
  * pass is needed. Cost: |points| + |intervals| · (len/bin + 1) rows
  * through one equi-shuffle — linear, skew-safe, AQE-friendly.
  *
  * Correct for ANY interval length (the explode covers every bin the
  * interval overlaps); `binSeconds` only trades interval-side row
  * blowup (≈ len/bin + 1 copies) against join selectivity — size it
  * near the TYPICAL interval length so most intervals explode into
  * 1-2 bins while points spread across enough bins to prune.
  */
object RangeJoin {

  /** points: (key..., tsCol, ...); intervals: (key..., startCol, endCol, ...).
    * Returns the inner join of every point inside an interval, with
    * all columns of both sides (interval columns prefixed `i_`). */
  def bucketed(points: DataFrame, intervals: DataFrame, key: Seq[String],
               tsCol: String, startCol: String, endCol: String,
               binSeconds: Long): DataFrame = {
    // TIMESTAMP_NTZ cannot cast straight to a number in Spark 4; hop
    // through timestamp_ltz (sessions here run UTC). Truncation to
    // whole seconds is monotone, which is all binning needs.
    def bin(c: org.apache.spark.sql.Column) =
      floor(unix_timestamp(c.cast("timestamp_ltz")) / binSeconds)
    val iPayload = intervals.columns.filterNot(key.contains).toSeq
    val exploded = intervals
      .select(key.map(col) ++ iPayload.map(c => col(c).as(s"i_$c")): _*)
      .withColumn("__bin", explode(sequence(bin(col(s"i_$startCol")), bin(col(s"i_$endCol")))))
    points
      .withColumn("__bin", bin(col(tsCol)))
      .join(exploded, key :+ "__bin")
      .filter(col(tsCol) >= col(s"i_$startCol") && col(tsCol) <= col(s"i_$endCol"))
      .drop("__bin")
  }
}
