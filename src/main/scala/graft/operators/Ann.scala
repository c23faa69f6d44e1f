package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{Hashing, StringSim}

/** Approximate-nearest-neighbor search over an embedding column.
  * Two paths:
  *  - [[bruteForceTopK]]: exact baseline. Queries are broadcast; each
  *    partition keeps a local top-k heap per query (mapPartitions →
  *    one small (nQueries × k × nPartitions) shuffle → final window).
  *    The per-row cost is one dot product; NO per-pair row explosion
  *    reaches the shuffle.
  *  - [[lshTopK]]: scale path — random-hyperplane buckets with
  *    multi-probe, exact rescoring inside probed buckets only.
  * Generalizes the reference's all-pairs cosine kNN
  * (few_shots_techniques.py:71-81) the way the north rule's
  * blocking-key candidate generation prescribes.
  */
object Ann {

  final case class Neighbor(query_id: Long, vec_id: Long, sim: Double)

  private def toArr(v: Seq[Float]): Array[Float] = v.toArray

  /** Exact top-k per query via broadcast queries + per-partition heaps. */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                     queries: Array[(Long, Array[Float])], k: Int): Dataset[Neighbor] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(queries)
    val partial = embeddings
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val qs = bc.value
        // one bounded heap per query; emits ≤ qs.length * k rows per partition
        val heaps = qs.map(_ => scala.collection.mutable.PriorityQueue.empty[Neighbor](
          Ordering.by[Neighbor, (Double, Long)](n => (-n.sim, n.vec_id))))
        it.foreach { case (id, v) =>
          val arr = toArr(v)
          var qi = 0
          while (qi < qs.length) {
            val (qid, qv) = qs(qi)
            if (qid != id) {
              val s = StringSim.cosine(arr, qv)
              val h = heaps(qi)
              if (h.size < k) h.enqueue(Neighbor(qid, id, s))
              else if (s > h.head.sim || (s == h.head.sim && id < h.head.vec_id)) {
                h.dequeue(); h.enqueue(Neighbor(qid, id, s))
              }
            }
            qi += 1
          }
        }
        heaps.iterator.flatMap(_.iterator)
      }
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    partial.toDF()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "vec_id", "sim")
      .as[Neighbor]
  }

  /** Deterministic hyperplane matrix (planes × dim), hoisted OUT of
    * the per-row loop: round-1 profiling showed the per-(plane, dim)
    * hash64 recomputation dominating the ann_lsh_topk scan (~10× the
    * necessary per-row work). Built once driver-side (or once per
    * partition) and reused for every vector. */
  private[operators] def planeMatrix(planes: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(planes)(p => Array.tabulate(dim)(j =>
      Hashing.toUnit(Hashing.hash64(p.toLong * 131071L + j, seed)) * 2 - 1))

  private[operators] def bucketOf(v: Array[Float], mat: Array[Array[Double]]): Int = {
    var bits = 0
    var p = 0
    while (p < mat.length) {
      val row = mat(p)
      var dot = 0.0
      var j = 0
      val n = math.min(v.length, row.length)
      while (j < n) { dot += v(j) * row(j); j += 1 }
      if (dot >= 0) bits |= (1 << p)
      p += 1
    }
    bits
  }

  /** Deterministic driver-local Lloyd's k-means over a bounded sample
    * of UNIT vectors: init = first k sample vectors (the sample is
    * content-hash-ordered, so init is pseudo-random but reproducible),
    * assignment by max dot product (≡ cosine on unit vectors), update
    * = renormalized mean, empty cluster keeps its centroid. */
  private[operators] def kmeansUnit(sample: Array[Array[Float]], kLists: Int,
                                    iters: Int): Array[Array[Double]] = {
    def unit(v: Array[Float]): Array[Double] = {
      var n = 0.0; var i = 0
      while (i < v.length) { n += v(i) * v(i); i += 1 }
      val inv = if (n == 0) 0.0 else 1.0 / math.sqrt(n)
      v.map(_ * inv)
    }
    val pts = sample.map(unit)
    var cents = pts.take(math.min(kLists, pts.length)).map(_.clone())
    (0 until iters).foreach { _ =>
      val sums = Array.fill(cents.length)(new Array[Double](pts.headOption.map(_.length).getOrElse(0)))
      val counts = new Array[Long](cents.length)
      pts.foreach { p =>
        val c = nearestCentroid(p, cents)
        counts(c) += 1
        var j = 0
        while (j < p.length) { sums(c)(j) += p(j); j += 1 }
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else {
          var n = 0.0; var j = 0
          while (j < sums(c).length) { n += sums(c)(j) * sums(c)(j); j += 1 }
          val inv = if (n == 0) 0.0 else 1.0 / math.sqrt(n)
          sums(c).map(_ * inv)
        }
      }
    }
    cents
  }

  private[operators] def nearestCentroid(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestDot = Double.NegativeInfinity; var c = 0
    while (c < cents.length) {
      val row = cents(c)
      var dot = 0.0; var j = 0
      val n = math.min(v.length, row.length)
      while (j < n) { dot += v(j) * row(j); j += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  /** cosine(float vec, double centroid) — promotes to double per term,
    * accumulating left-to-right like the SQL engines' list kernels. */
  private[operators] def cosineFD(v: Array[Float], c: Array[Double]): Double = {
    var dot = 0.0; var nv = 0.0; var nc = 0.0; var j = 0
    val n = math.min(v.length, c.length)
    while (j < n) {
      val x = v(j).toDouble; val y = c(j)
      dot += x * y; nv += x * x; nc += y * y; j += 1
    }
    if (nv == 0 || nc == 0) 0.0 else dot / math.sqrt(nv * nc)
  }

  private def quantTo(x: Double, prec: Int): Double =
    if (prec < 0) x
    else BigDecimal(x).setScale(prec, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Inverted-list assignment by max COSINE affinity (≡ max dot on the
    * unit centroids kmeansUnit emits), with optional rounding of the
    * affinity before the argmax so an oracle engine computing the same
    * cosine in its own operation order reaches the same list. Ties
    * break toward the lower list id. */
  private[operators] def listAffinities(v: Array[Float], cents: Array[Array[Double]],
                                        prec: Int): Array[Double] =
    cents.map(c => quantTo(cosineFD(v, c), prec))

  private[operators] def nearestList(v: Array[Float], cents: Array[Array[Double]],
                                     prec: Int): Int = {
    val aff = listAffinities(v, cents, prec)
    var best = 0; var c = 1
    while (c < aff.length) { if (aff(c) > aff(best)) best = c; c += 1 }
    best
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path next to
    * [[lshTopK]]: train a small deterministic k-means codebook on a
    * bounded content-hash-ordered sample (one bounded collect — the
    * codebook, like a few-shot pool, is a frozen small artifact
    * relative to the corpus), then one narrow scan pass in which each
    * vector computes its inverted-list id and is exact-cosine-rescored
    * ONLY against queries probing that list (each query probes its
    * `nProbe` nearest centroids). No per-pair row explosion reaches
    * the shuffle — identical shape to lshTopK with learned buckets,
    * which track the data distribution instead of random hyperplanes. */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queries: Array[(Long, Array[Float])], k: Int,
              nLists: Int = 16, nProbe: Int = 4, sampleSize: Int = 1024,
              iters: Int = 5, seed: Long = 42L): Dataset[Neighbor] = {
    val spark = embeddings.sparkSession
    import spark.implicits._

    // bounded, deterministic training sample (content-hash order)
    val sample = embeddings
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(sampleSize)
      .as[(Long, Seq[Float])]
      .collect().map(x => toArr(x._2))
    val cents = kmeansUnit(sample, nLists, iters)
    ivfTopKWith(embeddings, idCol, vecCol, queries, k, cents, nProbe)
  }

  /** The same inverted-list kernel with an INJECTED codebook and
    * optional rounding of (a) the assignment affinity before the
    * argmax and (b) the rescoring sim before ranking — the oracle-
    * portable surface, mirroring [[lshTopKWith]]: q40 feeds a codebook
    * both engines derive from md5 hex, so DuckDB can reproduce list
    * assignment, probe sets and in-list rescoring bit-for-bit.
    * Affinity uses COSINE (≡ dot on [[kmeansUnit]]'s unit centroids),
    * which any SQL engine has as a list primitive. Negative precisions
    * keep raw doubles (the production default). */
  def ivfTopKWith(embeddings: DataFrame, idCol: String, vecCol: String,
                  queries: Array[(Long, Array[Float])], k: Int,
                  cents: Array[Array[Double]], nProbe: Int,
                  assignPrecision: Int = -1, simPrecision: Int = -1): Dataset[Neighbor] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    def quant(x: Double): Double = quantTo(x, simPrecision)

    // query → probed lists (nProbe highest-affinity centroids per query)
    val queryLists: Map[Int, Array[(Long, Array[Float])]] = queries
      .flatMap { case (qid, qv) =>
        listAffinities(qv, cents, assignPrecision).zipWithIndex
          .sortBy { case (a, c) => (-a, c) }
          .take(nProbe)
          .map { case (_, c) => (c, (qid, qv)) }
      }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
    val bcQ = spark.sparkContext.broadcast(queryLists)
    val bcC = spark.sparkContext.broadcast(cents)

    val partial = embeddings
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val cs = bcC.value
        val ql = bcQ.value
        it.flatMap { case (id, v) =>
          val arr = toArr(v)
          ql.getOrElse(nearestList(arr, cs, assignPrecision), Array.empty[(Long, Array[Float])]).collect {
            case (qid, qv) if qid != id => Neighbor(qid, id, quant(StringSim.cosine(arr, qv)))
          }
        }
      }
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    partial.toDF()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "vec_id", "sim")
      .as[Neighbor]
  }

  /** LSH-bucketed ANN: hyperplane signature buckets + multi-probe,
    * exact cosine rescoring only inside probed buckets, then top-k. */
  def lshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queries: Array[(Long, Array[Float])], k: Int,
              planes: Int = 10, probes: Int = 11, seed: Long = 42L): Dataset[Neighbor] = {
    val dim = if (queries.nonEmpty) queries(0)._2.length else 0
    lshTopKWith(embeddings, idCol, vecCol, queries, k,
      planeMatrix(planes, dim, seed), probes)
  }

  /** The same bucketed kernel with an INJECTED plane matrix and
    * optional pre-ranking sim rounding — the oracle-portable surface:
    * q37 feeds a matrix both engines derive from md5 hex (so DuckDB
    * reproduces bucket membership bit-for-bit) and rounds sims before
    * ranking (so rank ties break identically across engines).
    * `simPrecision < 0` keeps raw doubles (the production default). */
  def lshTopKWith(embeddings: DataFrame, idCol: String, vecCol: String,
                  queries: Array[(Long, Array[Float])], k: Int,
                  mat: Array[Array[Double]], probes: Int,
                  simPrecision: Int = -1): Dataset[Neighbor] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val planes = mat.length
    def quant(x: Double): Double =
      if (simPrecision < 0) x
      else BigDecimal(x).setScale(simPrecision, BigDecimal.RoundingMode.HALF_UP).toDouble

    // query → probed buckets (own + 1-bit flips, capped at `probes`)
    val queryBuckets: Map[Int, Array[(Long, Array[Float])]] = queries
      .flatMap { case (qid, qv) =>
        val b = bucketOf(qv, mat)
        (Seq(b) ++ (0 until planes).map(i => b ^ (1 << i))).take(probes).map(bb => (bb, (qid, qv)))
      }
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2) }
    val bc = spark.sparkContext.broadcast(queryBuckets)
    val bcMat = spark.sparkContext.broadcast(mat)

    val partial = embeddings
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val m = bcMat.value
        val qb = bc.value
        it.flatMap { case (id, v) =>
          val arr = toArr(v)
          qb.getOrElse(bucketOf(arr, m), Array.empty[(Long, Array[Float])]).collect {
            case (qid, qv) if qid != id => Neighbor(qid, id, quant(StringSim.cosine(arr, qv)))
          }
        }
      }
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    partial.toDF()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "vec_id", "sim")
      .as[Neighbor]
  }
}
