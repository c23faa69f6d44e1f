package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concatenate-and-cut step that turns a
  * cleaned corpus into fixed-length training sequences (GPT-style
  * packing: documents are laid end-to-end in a deterministic order
  * and cut every `budget` tokens, so a document may straddle a cut).
  *
  * This operator emits the packing PLAN (seq_id + offset per doc),
  * which is the part that needs global coordination; the actual
  * token materialization is a narrow map over it. The layout is a
  * prefix sum per `streamCol` partition — a window ordered by docId
  * within each stream, so parallelism = number of streams. At 100 TB
  * the stream key must be sharded (e.g. source × day-bucket) so no
  * single window partition exceeds a task; the seq_id stays globally
  * meaningful because it embeds the stream key. */
object Packing {

  /** Per-doc packing metadata: (stream, doc_id, n_tokens, start,
    * seq_id, offset) — doc's tokens occupy positions
    * [offset, …] of sequence seq_id (spilling into seq_id+1, … when
    * offset + n_tokens > budget). */
  def packPlan(docs: DataFrame, streamCol: String, idCol: String, textCol: String,
               budget: Int): DataFrame = {
    val nTokens = size(filter(split(lower(col(textCol)), "[^a-z]+"), w => w =!= lit("")))
      .cast("long")
    val w = Window.partitionBy(streamCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(streamCol), col(idCol), nTokens.as("n_tokens"))
      .withColumn("start", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("seq_id", floor(col("start") / budget).cast("long"))
      .withColumn("offset", col("start") % budget)
  }
}
