package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch phase-timer for q94 (round 6): splits the PPJoin pipeline
  * at its localCheckpoint barrier to see which side owns the wall. */
object Q94Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/nation.parquet").count()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q94probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      val toks = spark.read.parquet(s"$dir/documents.parquet")
        .where(pmod(col("doc_id"), lit(4)) === 0)
        .select(col("doc_id"),
          explode(array_distinct(
            filter(split(lower(col("text")), "[^a-z]+"), w => w =!= lit("")))).as("term"))
      val dfr = toks.groupBy("term").agg(count(lit(1)).as("df"))
      val ordered0 = toks.join(broadcast(dfr), "term")
        .groupBy("doc_id")
        .agg(array_sort(collect_list(struct(col("df"), col("term")))).as("kts"))
        .select(col("doc_id"), expr("transform(kts, k -> k.term)").as("ts"))
      val ordered = time("ordered ckpt")(ordered0.localCheckpoint())
      val pre = ordered.select(col("doc_id"), size(col("ts")).as("n"),
        posexplode(expr("slice(ts, 1, cast(size(ts) - ceil(0.9 * size(ts)) + 1 as int))")).as(Seq("i", "term")))
      val cands = pre.groupBy("term")
        .agg(sort_array(collect_list(struct(col("doc_id").as("d"), col("n"), col("i")))).as("ds"))
        .filter(size(col("ds")) >= 2)
        .select(explode(expr(
          """flatten(transform(ds, (x, i) ->
            |  filter(transform(slice(ds, i + 2, size(ds)),
            |                   y -> struct(x.d AS a, y.d AS b, x.n AS na, y.n AS nb,
            |                               x.i AS ia, y.i AS ib)),
            |         p -> p.na >= 0.9 * p.nb AND p.nb >= 0.9 * p.na
            |           AND 19 * (least(p.ia, p.ib) + 1 +
            |                     least(p.na - p.ia - 1, p.nb - p.ib - 1)) >= 9 * (p.na + p.nb))))""".stripMargin)).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .dropDuplicates("a", "b")
      val nCands = time("cands count")(cands.count())
      println(s"  candidates: $nCands")
      val finNoIx = cands
        .join(ordered.select(col("doc_id").as("a"), col("ts").as("ta")), "a")
        .join(ordered.select(col("doc_id").as("b"), col("ts").as("tb")), "b")
        .select(col("a"), col("b"), size(col("ta")).as("na"), size(col("tb")).as("nb"))
        .where(col("na") + col("nb") > 1)
      time("join-only noop")(finNoIx.write.format("noop").mode("overwrite").save())
      val fin = cands
        .join(ordered.select(col("doc_id").as("a"), col("ts").as("ta")), "a")
        .join(ordered.select(col("doc_id").as("b"), col("ts").as("tb")), "b")
        .select(col("a"), col("b"),
          size(array_intersect(col("ta"), col("tb"))).cast("double").as("o"),
          size(col("ta")).as("na"), size(col("tb")).as("nb"))
        .withColumn("jaccard", col("o") / (col("na") + col("nb") - col("o")))
        .where(col("jaccard") >= 0.9)
      time("final noop")(fin.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
