package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalytics

/** DataFrame-level text-analysis operators: language ID, quality
  * scoring, token counting, fingerprinting. Each is a single narrow
  * typed-map stage (no shuffle); the cheap counters additionally
  * exist as pure built-in-function queries (RelationalQueries q11/q20)
  * so the parquet scan keeps whole-stage codegen where possible.
  */
object TextOps {

  final case class TextProfile(
      doc_id: Long,
      lang_pred: String,
      n_chars: Int,
      n_words: Int,
      tok_ws: Int,
      tok_bpe: Int,
      alpha_ratio: Double,
      digit_ratio: Double,
      punct_ratio: Double,
      stopword_ratio: Double,
      avg_word_len: Double,
      quality: Double,
      simhash_hex: String,
      n_fingerprints: Int,
      min_fingerprint: Long,
      has_verb: Boolean,
      numeric_keep: Boolean)

  /** Full per-doc profile in one pass over the text. */
  def profile(docs: DataFrame, idCol: String, textCol: String): Dataset[TextProfile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text0) =>
          val text = if (text0 == null) "" else text0
          val q = TextAnalytics.quality(text)
          val fps = TextAnalytics.winnow(text)
          TextProfile(
            id,
            TextAnalytics.langId(text),
            q.nChars, q.nWords,
            TextAnalytics.tokenCountWs(text),
            TextAnalytics.tokenCountBpeIsh(text),
            q.alphaRatio, q.digitRatio, q.punctRatio, q.stopwordRatio,
            q.avgWordLen, q.score,
            f"${TextAnalytics.simhash64(text)}%016x",
            fps.length,
            if (fps.isEmpty) 0L else fps.min,
            TextAnalytics.hasVerb(text),
            TextAnalytics.numericRatioKeep(text))
        }
      }
  }

  /** Quality-gated corpus filter (the cleaning pass a training-data
    * pipeline runs before extraction): keep docs above a quality
    * score with sane length. */
  def qualityFilter(docs: DataFrame, idCol: String, textCol: String,
                    minQuality: Double = 0.3, minWords: Int = 5): DataFrame = {
    val p = profile(docs, idCol, textCol).toDF()
    docs.join(p.filter(col("quality") >= minQuality && col("n_words") >= minWords)
      .select(col("doc_id").as("__keep_id")),
      docs(idCol).cast("long") === col("__keep_id"), "left_semi")
  }

  /** Document fingerprint postings (winnowing): one row per (doc,
    * fingerprint) — self-join on fingerprint finds copied passages. */
  def fingerprintPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, t) =>
        TextAnalytics.winnow(if (t == null) "" else t).map(fp => (id, fp))
      }
      .toDF("doc_id", "fingerprint")
  }
}
