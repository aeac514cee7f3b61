package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** One-off phase timing for the graph_pagerank query shape. */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pr] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val raw = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sup"))
      .distinct()
      .persist()
    t("raw build")(raw.count())
    val edges = raw
      .select(col("c").as("src"), (col("sup") + 1000000L).as("dst"))
      .union(raw
        .select((col("sup") + 1000000L).as("src"), col("c").as("dst")))
    val pr = t("pageRank total")(
      graft.llm.Graph.pageRank(edges, "src", "dst", iters = 5))
    t("final collect")(pr.orderBy(col("id")).count())
    raw.unpersist()
    spark.stop()
  }
}
