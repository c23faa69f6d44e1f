package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling (north rule: "salted keys for hot-entity
  * skew"). Two standard shapes:
  *
  *  - [[saltedAggregate]]: two-phase aggregation — partial aggregate
  *    on (key, salt), final on key. Use when a single group (the hot
  *    mention string) would overload one reducer and the aggregate is
  *    algebraic. (Spark's own partial aggregation covers simple
  *    aggs; the explicit form matters for collect_list-style
  *    non-reducible buffers or custom UDAFs.)
  *  - [[saltedJoin]]: skewed-fact × dim equi-join — the fact side
  *    gets a deterministic per-row salt, the dim side is replicated
  *    once per salt value, and the join key becomes (key, salt), so
  *    one hot key spreads over `salt` reducers. For dims too large to
  *    broadcast but far smaller than the fact table.
  *
  * Salts are content-derived (xxhash64 over the row's columns), never
  * random — determinism at any parallelism is a pipeline invariant.
  * AQE's skew-join split handles residual imbalance at runtime.
  */
object Skew {

  /** Deterministic row salt in [0, n). */
  def rowSalt(cols: Seq[Column], n: Int): Column =
    pmod(xxhash64(cols: _*), lit(n)).cast("int")

  /** Two-phase salted count per key (generalizes to any algebraic
    * aggregate: pass partial + final column specs). */
  def saltedCount(df: DataFrame, keyCol: String, salt: Int = 16): DataFrame = {
    val saltCol = rowSalt(df.columns.map(col).toSeq, salt)
    df.withColumn("__salt", saltCol)
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as("cnt"))
  }

  /** Salted equi-join: fact (big, skewed on `key`) × dim (small-ish).
    * dim rows replicate `salt` times; fact rows carry a deterministic
    * salt — result rows identical to a plain inner join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt", rowSalt(fact.columns.map(col).toSeq, salt))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
