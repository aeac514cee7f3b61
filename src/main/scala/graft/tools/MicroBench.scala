package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Micro-benchmark: native codegen'd cosine vs composable
  * higher-order-function cosine, on synthetic 64-dim vectors.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dim = 64
    // +1 keeps every vector nonzero: the composed cosine raises ANSI
    // DIVIDE_BY_ZERO on zero-norm input (the native expr returns null —
    // that robustness difference is asserted in CosineExprSpec)
    val vecExpr = array((0 until dim).map(i =>
      (col("id") * (i + 1) % 97 + 1).cast("double")): _*)
    val q = Array.tabulate(dim)(i => (i % 7).toDouble + 0.5)
    val df = spark.range(n).select(col("id"), vecExpr.as("v")).cache()
    df.count() // materialize

    def time(name: String)(body: => Unit): Unit = {
      body // warmup
      val t0 = System.nanoTime()
      body
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val qLit = typedLit(q.toSeq)
    time("native ")(df.select(sum(
      graft.functions.GraftFunctions.cosine(col("v"), qLit))).collect())
    time("composed")(df.select(sum(
      Similarity.cosine(col("v"), qLit))).collect())
    spark.stop()
  }
}
