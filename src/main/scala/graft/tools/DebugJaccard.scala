package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.llm.{Dedup, TextAnalysis}

/** Throwaway stage probe for jaccardJoinExact (not part of the API). */
object DebugJaccard {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, d)
    def time(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
    }
    val base = docs.select(col("doc_id").as("id"),
      Dedup.hashedShingles(col("text"), 3).as("sh"))
    time("shingle+count")(base.count())
    val toks = base.select(col("id"), explode(col("sh")).as("tok"))
    time("explode tokens")(toks.count())
    val withDf = toks.withColumn("df", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("tok"))))
    val ordered = withDf.groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ord"))
      .select(col("id"), transform(col("ord"), x => x("tok")).as("rare_first"),
        size(col("ord")).as("sz"))
    time("window+rebuild")(ordered.count())
    val t = 0.7
    val prefixes = ordered.select(col("id").cast("long").as("id"), col("sz"),
      posexplode(slice(col("rare_first"), lit(1),
        col("sz") - ceil(col("sz") * lit(t)).cast("int") + lit(1)))
        .as(Seq("pos", "tok")))
    time("prefix rows")(prefixes.count())
    time("bucket sizes")(
      prefixes.groupBy(col("tok")).count().filter(col("count") >= 2)
        .agg(count(lit(1)), sum(col("count") * (col("count") - 1) / 2),
          max(col("count"))).collect().toSeq)
    time("full query")(
      Dedup.jaccardJoinExact(docs, "doc_id", "text", threshold = t).count())
    val edges = Dedup.jaccardJoinExact(docs, "doc_id", "text", threshold = t)
      .persist()
    time("edges materialize")(edges.count())
    time("cc given edges")(
      Dedup.connectedComponents(docs, "doc_id", edges, "id_a", "id_b").count())
    edges.unpersist()
    time("cc full (unpersisted edges)")(
      Dedup.connectedComponents(docs, "doc_id",
        Dedup.jaccardJoinExact(docs, "doc_id", "text", threshold = t),
        "id_a", "id_b").count())
    spark.stop()
  }
}
