package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the perplexity-proxy quality
  * filter of CCNet-style pipelines (Wenzek et al. 2020 train a 5-gram
  * KenLM; at the unigram level the same machinery is exact SQL, which
  * is what makes the q50 oracle possible).
  *
  * Model: Laplace-smoothed unigram over a BOUNDED vocabulary — the
  * top `maxVocab` corpus words by frequency (deterministic
  * (n DESC, word ASC) tie-break), everything else scored as one OOV
  * bucket. Bounding the vocab is what a production pipeline does
  * anyway (the shipped model must be broadcastable), and it keeps the
  * scoring join a broadcast at any corpus size:
  *
  *   scan → explode words → [vocab agg: one shuffle, top-K bounded]
  *        → broadcast(model) hash join → per-doc avg: one shuffle.
  */
object UnigramLM {

  private def words(textCol: String) =
    filter(split(lower(col(textCol)), "[^a-z]+"), w => w =!= lit(""))

  /** The fitted model: (word, n, logprob) for the top-`maxVocab`
    * words. Smoothing: lp(w) = ln((n_w + 1) / (total + V + 1)) with
    * `total` = ALL word occurrences (in- and out-of-vocab) and
    * V + 1 = vocab size plus the OOV bucket;
    * lp(OOV) = ln(1 / (total + V + 1)). */
  def fit(docs: DataFrame, textCol: String, maxVocab: Int): DataFrame = {
    val counts = docs.select(explode(words(textCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
    counts
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxVocab)
      .crossJoin(broadcast(counts.agg(
        sum("n").as("__total"), count(lit(1)).as("__distinct"))))
      .select(col("word"), col("n"),
        log((col("n") + 1).cast("double") /
          (col("__total") + least(col("__distinct"), lit(maxVocab.toLong)) + 1))
          .as("logprob"),
        (col("__total") + least(col("__distinct"), lit(maxVocab.toLong)) + 1).as("__denom"))
  }

  /** Per-document mean token log-probability under the corpus's own
    * unigram model (self-scoring, the usual first pass; score against
    * a reference corpus by fitting there and scoring here). Documents
    * with zero [a-z] words carry no signal and are omitted. */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
                maxVocab: Int = 65536): DataFrame = {
    val model = fit(docs, textCol, maxVocab)
    // the smoothing denominator as a 1-row broadcast (the model rows
    // all carry the same value; OOV rows need it after the left join)
    val denom = model.agg(max("__denom").as("__denom"))
    docs.select(col(idCol).cast("long").as("doc_id"), explode(words(textCol)).as("word"))
      .join(broadcast(model.select("word", "logprob")), Seq("word"), "left")
      .crossJoin(broadcast(denom))
      .withColumn("lp", coalesce(col("logprob"), log(lit(1.0) / col("__denom"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), round(avg("lp"), 6).as("mean_logprob"))
  }
}
