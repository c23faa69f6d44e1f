package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-pruned semi join — sideways information passing for the
  * "filter a 100-TB fact scan by a key set too large to broadcast"
  * shape (the same idea Spark's own `InjectRuntimeFilter` applies
  * when statistics let it; here it is explicit and deterministic).
  *
  * A plain left-semi join against a large key set shuffles BOTH
  * sides on the key, so every non-matching fact row — at 100 TB the
  * overwhelming majority — pays a full shuffle write+read before
  * being discarded. A Bloom filter of the keys is bounded by its BIT
  * budget, not the key count (1M keys at 3% fpp ≈ 0.9 MiB), so it
  * broadcasts cheaply at any key cardinality and prunes map-side,
  * before the shuffle. The trailing exact left-semi join removes the
  * filter's false positives, so the composition is EXACTLY the semi
  * join (BloomPruneSpec asserts equality; q65 oracles it as an `IN`
  * subquery) — the bloom stage is pure shuffle-volume reduction.
  *
  * The probe is a scalar UDF over the broadcast sketch
  * (`spark.util.sketch.BloomFilter`, the same implementation the
  * runtime filter uses); a UDF is acceptable here because it is a
  * SELECTIVE PRE-FILTER feeding codegen'd operators, not a hot-path
  * transform — per row it costs k=~5 hash probes against ~1 MiB of
  * local bits, versus the shuffle write it saves.
  *
  * `keys` is evaluated twice (once to build the sketch, once for the
  * exactness join); persist or localCheckpoint it first when it is
  * an expensive derived frame rather than a scan.
  */
object BloomPrune {

  /** Semi join `big` to `keys` on a LONG key, bloom-pruning the big
    * side map-side before the exact join. `expectedItems` sizes the
    * sketch (overestimating only wastes bits, never correctness). */
  def semiJoinLong(big: DataFrame, bigKey: String,
                   keys: DataFrame, keyCol: String,
                   expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bf = keys.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    big.filter(mightContain(col(bigKey)))
      .join(keys.select(col(keyCol).as(bigKey)).distinct(), Seq(bigKey), "left_semi")
  }
}
