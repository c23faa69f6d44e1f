package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.sys
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch harness for the q15 theta-join shape (round 6): compares
  * physical strategies for "score |s|×|c| pairs, keep top-1 per s".
  * Not part of the bench surface. */
object Q15Probe {
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
    graft.plans.JaroWinklerExpression.register(spark)
    def s = spark.read.parquet(s"$dir/supplier.parquet").select("s_name")
    def c = spark.read.parquet(s"$dir/customer.parquet").select("c_name")
    val w = Window.partitionBy("s_name").orderBy(col("jw").desc, col("c_name"))

    def vA: DataFrame = // window over repartition(col) BNLJ (current)
      s.repartition(col("s_name")).join(broadcast(c))
        .withColumn("jw", round(expr("jaro_winkler(s_name, c_name)"), 6))
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("s_name"), col("c_name"), col("jw"))
    def vB: DataFrame = // window over repartition(n, col) BNLJ
      s.repartition(cores, col("s_name")).join(broadcast(c))
        .withColumn("jw", round(expr("jaro_winkler(s_name, c_name)"), 6))
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("s_name"), col("c_name"), col("jw"))
    def vC: DataFrame = { // dummy-key broadcast hash join + window
      val s2 = s.repartition(cores, col("s_name")).withColumn("k", lit(1))
      val c2 = c.withColumn("k", lit(1))
      s2.join(broadcast(c2), "k")
        .withColumn("jw", round(expr("jaro_winkler(s_name, c_name)"), 6))
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("s_name"), col("c_name"), col("jw"))
    }
    def vD: DataFrame = { // old min(struct) aggregate, repartitioned
      s.repartition(cores, col("s_name")).join(broadcast(c))
        .withColumn("jw", round(expr("jaro_winkler(s_name, c_name)"), 6))
        .groupBy("s_name")
        .agg(min(struct((col("jw") * -1).as("njw"), col("c_name"), col("jw"))).as("best"))
        .select(col("s_name"), col("best.c_name").as("c_name"), col("best.jw").as("jw"))
    }
    spark.read.parquet(s"$dir/nation.parquet").count()
    Seq("A" -> (() => vA), "B" -> (() => vB), "C" -> (() => vC), "D" -> (() => vD))
      .foreach { case (name, f) =>
        val walls = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          if (sys.env.contains("Q15_COUNT")) f().count() else f().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[q15probe] $name noop=" + walls.map(x => f"$x%.2f").mkString("/"))
      }
    println("C plan:"); vC.explain("formatted")
    spark.stop()
  }
}
