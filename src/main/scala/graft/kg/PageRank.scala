package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank by distributed power iteration — the KG step
  * that turns an entity co-occurrence graph into an importance
  * ranking (which entities anchor the graph; used for triple
  * prioritization and review ordering the way the reference's human
  * loop eyeballs the biggest Excel clusters first,
  * entityMatching.py:170-430).
  *
  * Scale shape (mirrors [[Canonicalize]]'s loop): the normalized
  * edge table is computed ONCE and localCheckpoint'd (static across
  * rounds); each round is one equi-join ranks⋈edges on src plus one
  * groupBy(dst).sum — both partial-aggregable, so a high-in-degree
  * hub (the skew case for rank flow) collapses in the map-side
  * combiner, no salting needed. Per-round work is O(|E|) with a
  * single shuffle; rounds are a constant (fixed `iterations`) or
  * bounded by `maxIter` with an L1-delta stop. Lineage is cut every
  * round. Dangling vertices (no out-edges) redistribute their mass
  * uniformly — the standard correction that keeps ranks a
  * distribution (sum = 1, PageRankSpec gates it).
  */
object PageRank {

  /** edges: (src, dst, weight) directed. Returns (vertex, rank).
    *
    * `iterations = Some(k)` runs exactly k rounds — the deterministic
    * contract the q68 DuckDB oracle unrolls in SQL. `None` iterates
    * to `tol` (L1 delta) with `maxIter` as a safety valve that THROWS
    * on non-convergence rather than returning wrong ranks. */
  def run(edges: DataFrame, damping: Double = 0.85,
          iterations: Option[Int] = None,
          maxIter: Int = 40, tol: Double = 1e-9): DataFrame = {
    // r6: materialize the edge table ONCE — it feeds four derivations
    // (vertices twice via the union, wout, trans), each of which would
    // otherwise re-run the caller's whole edge pipeline (q68: the full
    // co-occurrence groupBy per consumer; guide §2.4 "remove shuffles
    // outright" — here remove whole repeated passes)
    val e = edges.localCheckpoint()
    val vertices = e.select(col("src").as("vertex"))
      .union(e.select(col("dst").as("vertex")))
      .distinct()
      .localCheckpoint()
    val n = vertices.count()
    require(n > 0, "PageRank over an empty graph")

    // out-strength per src, then per-edge transition probability;
    // static across rounds → checkpoint once.
    val wout = e.groupBy("src").agg(sum("weight").as("wout"))
    val trans = e.join(wout, "src")
      .select(col("src"), col("dst"), (col("weight") / col("wout")).as("p"))
      .localCheckpoint()
    // dangling vertices: no out-edges; their whole rank redistributes.
    val dangling = vertices.join(wout.select(col("src").as("vertex")), Seq("vertex"), "left_anti")
      .localCheckpoint()

    var ranks = vertices.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    val base = (1.0 - damping) / n
    var iter = 0
    var delta = Double.MaxValue
    val rounds = iterations.getOrElse(maxIter)
    while (iter < rounds && (iterations.isDefined || delta > tol)) {
      // dangling mass stays IN the plan as a 1-row aggregate broadcast
      // back onto the update (the q67 nCtx pattern): same sum, but the
      // round no longer pays a separate collect job for one double —
      // fixed-iteration rounds are ONE job each instead of two.
      // Convergence mode still collects (the loop condition needs the
      // delta driver-side — the iterative contract's one scalar).
      val danglingMass = dangling.join(ranks, "vertex")
        .agg(coalesce(sum("rank"), lit(0.0)).as("dmass"))
      val contribs = trans.join(ranks, trans("src") === ranks("vertex"))
        .select(trans("dst").as("vertex"), (col("p") * col("rank")).as("c"))
        .groupBy("vertex").agg(sum("c").as("inflow"))
      val next = vertices.join(contribs, Seq("vertex"), "left")
        .crossJoin(broadcast(danglingMass))
        .select(col("vertex"),
          (lit(base) + lit(damping) *
            (coalesce(col("inflow"), lit(0.0)) + col("dmass") / lit(n.toDouble))).as("rank"))
        .localCheckpoint()
      if (iterations.isEmpty)
        delta = ranks.join(next.withColumnRenamed("rank", "nrank"), "vertex")
          .agg(sum(abs(col("rank") - col("nrank")))).head().getDouble(0)
      ranks = next
      iter += 1
    }
    if (iterations.isEmpty && delta > tol)
      throw new IllegalStateException(
        s"PageRank did not converge in $maxIter rounds (L1 delta $delta > $tol)")
    ranks
  }
}
