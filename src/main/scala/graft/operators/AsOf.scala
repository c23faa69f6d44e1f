package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the single right
  * row with the greatest `tsCol` ≤ the left row's, within the same
  * key group (the lookup every feature-store / slowly-changing-
  * dimension read performs; DuckDB/kdb call it ASOF JOIN, which is
  * exactly the q61 oracle's spelling).
  *
  * Spark has no native as-of operator and the naive spelling is a
  * range theta-join (per-left-row scan of all earlier right rows —
  * quadratic in group size and a cartesian at skewed keys). This
  * implementation is the scalable union-tag form:
  *
  *   1. tag right rows 0 / left rows 1 and unionByName them;
  *   2. ONE window over the key ordered by (ts, tag) — right rows
  *      sort before left rows at equal ts, making the match
  *      ts-inclusive like ASOF;
  *   3. `last(payload, ignoreNulls)` over the running frame carries
  *      the most recent right payload forward to each left row.
  *
  * Cost: one shuffle of |left| + |right| rows on the key, linear work
  * per group, no candidate explosion at any skew — the 100-TB shape.
  *
  * Contract: right must be unique per (key, ts) — pre-aggregate
  * otherwise (ASOF's own tie behavior is engine-defined; this
  * operator refuses to pick one silently). Left rows with no earlier
  * right row keep null payloads (LEFT ASOF semantics).
  */
object AsOf {

  def asOfJoin(left: DataFrame, right: DataFrame, key: Seq[String],
               tsCol: String, rightPrefix: String = "r_"): DataFrame = {
    val rPayload = right.columns.filterNot(key.contains).toSeq
    val rightTagged = right.select(
      key.map(col) ++ rPayload.map(c => col(c).as(rightPrefix + c))
        :+ col(tsCol).as(tsCol) :+ lit(0).as("__tag"): _*)
    val leftTagged = left.withColumn("__tag", lit(1))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rPayload.map(c =>
      last(col(rightPrefix + c), ignoreNulls = true).over(w).as(rightPrefix + c))
    unioned
      .select(left.columns.map(col).toSeq ++ carried :+ col("__tag"): _*)
      .filter(col("__tag") === 1)
      .drop("__tag")
  }
}
