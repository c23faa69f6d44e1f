package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Hashing, TextAnalytics}

/** Deduplication operators for the training-data pipeline: exact,
  * MinHash+LSH, SimHash and n-gram-Jaccard near-dup detection.
  * Generalizes the reference's dedup-by-text
  * (ner/Datasets/utils.py:33-45) to web-scale semantics.
  *
  * Scale design: every variant is
  *   sketch (narrow map) → band keys (explode) → equi-join on band →
  *   verify (exact measure on the candidate pair only).
  * No all-pairs work ever happens; the only shuffles are the band-key
  * join and the final distinct. Sketches are computed in one
  * mapPartitions pass per doc (no per-pair text access — texts are
  * re-joined only for the candidates that survive banding).
  */
object Dedup {

  final case class DocSketch(doc_id: Long, minhash: Array[Long], simhash: Long, nShingles: Int)
  final case class BandKey(band: Int, key: Long, doc_id: Long)
  final case class CandidatePair(a: Long, b: Long)
  final case class ScoredPair(a: Long, b: Long, score: Double)

  val NumHashes = 64
  val RowsPerBand = 4 // 16 bands → catches jaccard ≳ 0.5 w.h.p.
  val ShingleK = 3

  /** One-pass sketching: word-3-shingle minhash signature + simhash. */
  def sketch(docs: DataFrame, idCol: String, textCol: String): Dataset[DocSketch] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val sh = TextAnalytics.shingles(if (text == null) "" else text, ShingleK).toSet
          DocSketch(id, TextAnalytics.minHashSignature(sh, NumHashes),
            TextAnalytics.simhash64(if (text == null) "" else text), sh.size)
        }
      }
  }

  /** Candidate pairs sharing ≥1 LSH band. Join is equi on (band, key);
    * pair orientation a<b + distinct dedups multi-band hits. */
  def minhashCandidates(sketches: Dataset[DocSketch]): Dataset[CandidatePair] = {
    val spark = sketches.sparkSession
    import spark.implicits._
    val bands = sketches.flatMap { s =>
      TextAnalytics.lshBandKeys(s.minhash, RowsPerBand).zipWithIndex.map {
        case (k, b) => BandKey(b, k, s.doc_id)
      }
    }
    val l = bands.toDF("band", "key", "a")
    val r = bands.toDF("band", "key", "b")
    l.join(r, Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
      .as[CandidatePair]
  }

  /** MinHash near-dup pairs with EXACT Jaccard verification ≥ τ:
    * candidates → join texts back (twice) → exact shingle Jaccard. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double): Dataset[ScoredPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val texts = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
    val cands = minhashCandidates(sketch(docs, idCol, textCol)).toDF()
    cands
      .join(texts.withColumnRenamed("id", "a").withColumnRenamed("text", "ta"), "a")
      .join(texts.withColumnRenamed("id", "b").withColumnRenamed("text", "tb"), "b")
      .as[(Long, Long, String, String)]
      .map { case (b, a, ta, tb) => // after the two key-joins: (b, a, ta, tb)
        val ja = TextAnalytics.jaccard(
          TextAnalytics.shingles(ta, ShingleK).toSet,
          TextAnalytics.shingles(tb, ShingleK).toSet)
        ScoredPair(a, b, ja)
      }
      .filter(_.score >= threshold)
  }

  /** SimHash near-dups: 4×16-bit band buckets (any hamming-≤3 pair
    * shares at least one intact band by pigeonhole), verified by
    * exact hamming distance. */
  def simhashNearDups(sketches: Dataset[DocSketch], maxHamming: Int = 3): Dataset[ScoredPair] = {
    val spark = sketches.sparkSession
    import spark.implicits._
    require(maxHamming <= 3, "4-band pigeonhole covers hamming ≤ 3")
    val bands = sketches.flatMap { s =>
      (0 until 4).map { b =>
        BandKey(b, (s.simhash >>> (b * 16)) & 0xFFFFL, s.doc_id)
      }
    }
    val sigs = sketches.select(col("doc_id"), col("simhash"))
    val l = bands.toDF("band", "key", "a")
    val r = bands.toDF("band", "key", "b")
    l.join(r, Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
      .join(sigs.withColumnRenamed("doc_id", "a").withColumnRenamed("simhash", "sa"), "a")
      .join(sigs.withColumnRenamed("doc_id", "b").withColumnRenamed("simhash", "sb"), "b")
      .as[(Long, Long, Long, Long)]
      .map { case (b, a, sa, sb) =>
        ScoredPair(a, b, TextAnalytics.hamming64(sa, sb).toDouble)
      }
      .filter(_.score <= maxHamming)
  }

  /** n-gram Jaccard near-dups: same banding for candidates, verify on
    * character n-grams instead of word shingles (robust for short /
    * no-whitespace strings, e.g. entity names). */
  def ngramJaccardNearDups(docs: DataFrame, idCol: String, textCol: String,
                           n: Int, threshold: Double): Dataset[ScoredPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val texts = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
    val grams = texts.as[(Long, String)].mapPartitions { it =>
      it.map { case (id, t) =>
        val g = TextAnalytics.charNgrams(if (t == null) "" else t.toLowerCase, n).toSet
        DocSketch(id, TextAnalytics.minHashSignature(g, NumHashes), 0L, g.size)
      }
    }
    val cands = minhashCandidates(grams).toDF()
    cands
      .join(texts.withColumnRenamed("id", "a").withColumnRenamed("text", "ta"), "a")
      .join(texts.withColumnRenamed("id", "b").withColumnRenamed("text", "tb"), "b")
      .as[(Long, Long, String, String)]
      .map { case (b, a, ta, tb) =>
        ScoredPair(a, b, TextAnalytics.jaccard(
          TextAnalytics.charNgrams(ta.toLowerCase, n).toSet,
          TextAnalytics.charNgrams(tb.toLowerCase, n).toSet))
      }
      .filter(_.score >= threshold)
  }

  /** Embedding near-dups: random-hyperplane LSH (deterministic seeded
    * planes), multi-probe (exact bucket + 1-bit flips) for recall,
    * exact cosine verification ≥ τ. */
  def embeddingNearDups(embeddings: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, planes: Int = 12, seed: Long = 42L): Dataset[ScoredPair] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = embeddings.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Long, Seq[Float])]
      .map { case (id, v) => (id, v.toArray) }
      .toDF("id", "vec").as[(Long, Array[Float])].cache()

    def bucketOf(v: Array[Float]): Int = {
      var bits = 0
      var p = 0
      while (p < planes) {
        var dot = 0.0
        var j = 0
        while (j < v.length) {
          // deterministic pseudo-gaussian plane component
          dot += v(j) * (Hashing.toUnit(Hashing.hash64(p.toLong * 131071L + j, seed)) * 2 - 1)
          j += 1
        }
        if (dot >= 0) bits |= (1 << p)
        p += 1
      }
      bits
    }

    val buckets = vecs.flatMap { case (id, v) =>
      val b = bucketOf(v)
      // multi-probe: own bucket + all 1-bit neighbors
      (Seq(b) ++ (0 until planes).map(i => b ^ (1 << i))).map(k => (k, id))
    }.toDF("bkt", "id")

    val l = buckets.withColumnRenamed("id", "a")
    val r = buckets.withColumnRenamed("id", "b")
    l.join(r, "bkt")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
      .join(vecs.toDF("a", "va"), "a")
      .join(vecs.toDF("b", "vb"), "b")
      .as[(Long, Long, Array[Float], Array[Float])]
      .map { case (b, a, va, vb) =>
        ScoredPair(a, b, graft.functions.StringSim.cosine(va, vb))
      }
      .filter(_.score >= threshold)
  }

  /** Per-doc candidate-cluster id: min doc_id over docs sharing any
    * minhash band (1-hop group; transitive closure is
    * Canonicalize.connectedComponents when needed). Always non-empty
    * — one row per doc. */
  def minhashClusters(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sketches = sketch(docs, idCol, textCol)
    val bands = sketches.flatMap { s =>
      TextAnalytics.lshBandKeys(s.minhash, RowsPerBand).zipWithIndex.map {
        case (k, b) => BandKey(b, k, s.doc_id)
      }
    }.toDF("band", "key", "doc_id")
    val bandMin = bands.groupBy("band", "key").agg(min("doc_id").as("band_min"))
    bands.join(bandMin, Seq("band", "key"))
      .groupBy("doc_id")
      .agg(min("band_min").as("cluster_id"))
  }
}
