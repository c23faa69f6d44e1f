package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application — the last
  * step of the training-data story (clean → dedup → decontaminate →
  * mix → pack → TOKENIZE).
  *
  * Classic BPE (Sennrich et al. 2016) trains on the WORD HISTOGRAM,
  * not the raw corpus: the only corpus-scale job here is one
  * explode→groupBy word-count pass bounded to the top `maxVocab`
  * words (q48's shape). The merge loop then runs driver-side over
  * that bounded histogram (≤ maxVocab rows × avg word length — the
  * same bounded-artifact contract as the IVF codebook), and the
  * trained merge table broadcasts back for distributed encoding.
  * At 100 TB the histogram pass is the only thing that grows.
  */
object BpeTrainer {

  final case class Merge(rank: Int, left: String, right: String)

  /** The one distributed pass: top-`maxVocab` word histogram with the
    * deterministic (n DESC, word ASC) tie-break. */
  def wordHistogram(docs: DataFrame, textCol: String, maxVocab: Int): DataFrame =
    docs.select(explode(filter(split(lower(col(textCol)), "[^a-z]+"), w => w =!= lit(""))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxVocab)

  /** Train `nMerges` merges. Deterministic: the best pair each round
    * is max by (weighted count DESC, (left, right) ASC). */
  def fit(docs: DataFrame, textCol: String, nMerges: Int, maxVocab: Int = 65536): Seq[Merge] = {
    val hist: Array[(Array[String], Long)] = wordHistogram(docs, textCol, maxVocab)
      .collect().map(r => (r.getString(0).split("").filter(_.nonEmpty), r.getLong(1)))
    var words = hist
    val merges = Vector.newBuilder[Merge]
    var rank = 0
    while (rank < nMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) return merges.result()
      val ((l, r), _) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
      merges += Merge(rank, l, r)
      words = words.map { case (syms, n) => (mergeOnce(syms, l, r), n) }
      rank += 1
    }
    merges.result()
  }

  private def mergeOnce(syms: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else {
        out += syms(i); i += 1
      }
    }
    out.result()
  }

  /** Greedy BPE encode of one word: apply merges in rank order. */
  def encodeWord(word: String, merges: Seq[Merge]): Seq[String] = {
    var syms = word.split("").filter(_.nonEmpty)
    merges.foreach(m => syms = mergeOnce(syms, m.left, m.right))
    syms.toSeq
  }

  /** Distributed encode: per-doc BPE token count under a broadcast
    * merge table (the corpus-side application of the trained
    * tokenizer; one narrow pass). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toIndexedSeq)
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        it.map { case (id, t) =>
          // the SAME tokenization the histogram trained on
          // (wordHistogram's split(lower, "[^a-z]+"))
          val ws = graft.functions.TextAnalytics.pipelineWords(if (t == null) "" else t)
          (id, ws.map(w => encodeWord(w, ms).length.toLong).sum)
        }
      }
      .toDF("doc_id", "n_tokens_bpe")
  }
}
