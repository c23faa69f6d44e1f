package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic data-mixing operators: stratified down-sampling and
  * integer up-sampling (epoch weighting) — how a training pipeline
  * turns per-source/per-language mixture weights into a concrete
  * corpus (cf. the sampling-weights tables of GPT-3 appendix A /
  * The Pile §1).
  *
  * Both are scan-shaped: the down-sample is a pure filter (no
  * shuffle, trivially parallel at 100 TB) and the up-sample is a
  * generate (explode) whose output partitioning inherits the scan's.
  * Determinism comes from content hashing, not `rand()`: the same
  * row always draws the same ticket, so reruns, retried tasks, and
  * the DuckDB oracle (q45) all agree — `rand(seed)` is
  * partition-layout-dependent in Spark and would not survive a
  * repartition, let alone an engine swap.
  */
object Sampling {

  /** Uniform-in-[0,65536) ticket from the first 4 hex chars of
    * md5(key) — engine-portable (the oracle recomputes it in SQL). */
  def ticket(key: Column): Column =
    conv(substring(md5(key), 1, 4), 16, 10).cast("long")

  /** Keep each row of stratum `s` with probability `rates(s)`
    * (default `defaultRate`), deterministically by content key.
    * Rates are quantized to 1/65536 ticks. */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit(math.round(defaultRate * 65536).toInt): Column) {
      case (c, (s, r)) => when(col(stratumCol) === s, lit(math.round(r * 65536).toInt)).otherwise(c)
    }
    df.filter(ticket(col(keyCol)) < threshold)
  }

  /** Repeat each row of stratum `s` `factors(s)` times (default
    * `defaultFactor`), tagging copies 1..n — the "epochs per source"
    * step of mixture training. Zero factors drop the stratum. */
  def mixtureUpsample(df: DataFrame, stratumCol: String,
                      factors: Map[String, Int], defaultFactor: Int): DataFrame = {
    val n = factors.foldLeft(lit(defaultFactor): Column) {
      case (c, (s, f)) => when(col(stratumCol) === s, lit(f)).otherwise(c)
    }
    // guard: Spark's sequence(1, 0) counts DOWN to [1, 0]; factor<=0
    // must mean "drop the stratum", so leave the array null there —
    // explode emits nothing for a null array
    df.withColumn("copy", explode(when(n >= 1, sequence(lit(1), n))))
  }

  /** Weighted sampling WITHOUT replacement, k per stratum
    * (Efraimidis–Spirakis, Inf. Process. Lett. 97(5), 2006): keep the
    * k rows with the smallest exp-ticket `-ln(u)/w`, which draws each
    * subset with probability proportional to its weights. As with
    * [[stratifiedSample]], u comes from content (the md5 ticket
    * mapped into (0,1]), not `rand()` — reruns, task retries, and the
    * DuckDB oracle (q69) agree bit-for-bit. Ties (same 16-bit ticket
    * AND weight) break on `tieCol`.
    *
    * Scale shape: a rank-filtered window, so Spark inserts a map-side
    * WindowGroupLimit — each input split forwards only its own top-k
    * per stratum into the shuffle (the q02/q58 pattern, plan-asserted
    * there). */
  def weightedSample(df: DataFrame, stratumCol: String, keyCol: String,
                     weightCol: String, tieCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = (ticket(col(keyCol)) + 1).cast("double") / lit(65537.0)
    val score = -log(u) / col(weightCol).cast("double")
    val w = Window.partitionBy(col(stratumCol)).orderBy(score.asc, col(tieCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
