package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Dedup
import graft.sources.Tables

/** Scale confirmation for `dedup_minhash` (the highest sf1 exponent,
  * 0.91): blow a slice of the fixture's documents up N× in-memory
  * with textual variants (near-dup families, the worst case for band
  * buckets) and time the EXACT query path — portable md5 minhash
  * signatures → band keys → window-min one-hop labeling
  * (`Dedup.minhashClustersPortable`, numHashes=8, bands=4, the
  * `dedup_minhash` registration). The question: does per-doc cost
  * flatten as the corpus grows (fixed cost amortizing) or creep
  * (super-linear term hiding under the fixed cost)? Reported: wall
  * time, rows, per-1k-doc cost, and band-bucket stats (max bucket
  * bounds the window-min partition — the only place quadratic work
  * could hide).
  *
  * Usage: ProbeMinhash [sfDir] [sliceDocs] [mult ...]
  */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val slice = if (args.length > 1) args(1).toInt else 10000
    val mults = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
      else Seq(1, 10, 30)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < slice)
      .select(col("doc_id"), col("text"))
      .persist()
    val nBase = base.count()
    println(s"[probe] minhash slice: $nBase docs from $sfDir")

    mults.foreach { mult =>
      val docs = (if (mult == 1) base
        else base
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0), lit(mult - 1))).as("copy"))
          .select((col("doc_id") * mult + col("copy")).as("doc_id"),
            concat(col("text"), lit(" variant marker "),
              col("copy").cast("string")).as("text")))
        .persist()
      val n = docs.count()
      // warm once (JIT/codegen), then time: the probe compares mults
      // against each other, so per-mult constant costs must not be
      // JIT noise from whichever mult runs first
      Dedup.minhashClustersPortable(
        docs, "doc_id", "text", numHashes = 8, bands = 4).count(): Unit
      val t0 = System.nanoTime()
      val rows = Dedup.minhashClustersPortable(
        docs, "doc_id", "text", numHashes = 8, bands = 4).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val bands = Dedup.bandKeysPortable(docs, "doc_id", "text",
          numHashes = 8, bands = 4)
        .groupBy(col("band")).agg(count(lit(1)).as("n"))
        .agg(max(col("n")), expr("percentile_approx(n, 0.99)"),
          count(lit(1)))
        .collect().head
      println(f"[probe] x$mult%-3d n=$n%8d rows=$rows%8d " +
        f"time=$secs%7.2fs per1k=${secs * 1000 / n}%6.3fs " +
        s"buckets=${bands.getLong(2)} p99=${bands.getLong(1)} " +
        s"max=${bands.getLong(0)}")
      docs.unpersist(): Unit
    }
    spark.stop()
  }
}
