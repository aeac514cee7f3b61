package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{Similarity, Vocabulary}
import graft.sources.Tables
import graft.streaming.Streams

/** Irreducible-cost attribution for the streaming index-append family
  * (the quiet bench's slowest-3): each query = stream machinery
  * (query start + per-epoch planning/WAL/commit) + the SAME index
  * writes a batch job would pay + the serve probe. This probe times
  * the three parts separately:
  *
  *   - `stream`: the full streaming run (appendXAvailableNow),
  *   - `batch`: the identical two-epoch append executed as two direct
  *     batch calls (no streaming engine),
  *   - `serve`: the disk top-k / bm25 probe alone.
  *
  * machinery = stream − batch. What remains after the r12 trims
  * (tmpfs ephemeral checkpoints, right-sized epoch partitions) is the
  * engine's per-epoch floor — it scales with EPOCH COUNT, not corpus,
  * so at real scale (minutes-long epochs) it vanishes into the noise;
  * the bench pays it because its epochs are milliseconds of data.
  */
object ProbeAppendEpochs {
  def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    val bits = Similarity.bitsFor(emb.count())
    val iso = graft.core.Sessions.isolated(spark,
      Map("spark.sql.shuffle.partitions" -> "8"))

    // ---------- LSH append family ----------
    def lshStream(): Double = {
      val path = s"/tmp/probe_lsh_s_${System.nanoTime()}"
      val stream = Streams.embeddingsStreamBatches(iso,
        s"$sfDir/embeddings.parquet")
      val (_, t) = timed(Streams.appendIndexAvailableNow(iso, stream,
        "embedding", "vec_id", path, dim = query.length, bits = bits,
        tables = 8, groups = 4))
      Similarity.rmTree(new java.io.File(path))
      t
    }
    def lshBatch(): (String, Double) = {
      val path = s"/tmp/probe_lsh_b_${System.nanoTime()}"
      val half1 = emb.filter(col("vec_id") % 2 === 0)
      val half2 = emb.filter(col("vec_id") % 2 === 1)
      val (_, t) = timed {
        Similarity.writeLshIndex(Similarity.multiTableIndex(half1,
          "embedding", "vec_id", dim = query.length, bits = bits,
          tables = 8), path, groups = 4)
        Similarity.appendLshIndex(half2, "embedding", "vec_id", path,
          dim = query.length, bits = bits, tables = 8, groups = 4)
      }
      (path, t)
    }
    // warm JIT/codegen on a throwaway pass of each shape
    lshStream(); val (wp, _) = lshBatch(); Similarity.rmTree(new java.io.File(wp))
    val tLs = lshStream()
    val (bp, tLb) = lshBatch()
    val (_, tServe) = timed(
      Similarity.topKAnnDisk(spark, bp, query, dim = query.length,
        bits = bits, tables = 8, k = 10, groups = 4).collect())
    Similarity.rmTree(new java.io.File(bp))
    println(f"[epochs] lsh_append: stream=$tLs%.2fs batch=$tLb%.2fs " +
      f"serve=$tServe%.2fs machinery=${tLs - tLb}%.2fs")

    // ---------- BM25 append family ----------
    val docs = Tables.documents(spark, sfDir)
    def bm25Stream(): Double = {
      val path = s"/tmp/probe_bm25_s_${System.nanoTime()}"
      val stream = Streams.documentsStreamBatches(iso,
        s"$sfDir/documents.parquet")
      val (_, t) = timed(Streams.appendBm25AvailableNow(iso, stream,
        "doc_id", "text", path, buckets = 8))
      Similarity.rmTree(new java.io.File(path))
      t
    }
    def bm25Batch(): (String, Double) = {
      val path = s"/tmp/probe_bm25_b_${System.nanoTime()}"
      val half1 = docs.filter(col("doc_id") % 2 === 0)
      val half2 = docs.filter(col("doc_id") % 2 === 1)
      val (_, t) = timed {
        Vocabulary.writeBm25Index(half1, "doc_id", "text", path,
          buckets = 8)
        Vocabulary.appendBm25Index(half2, "doc_id", "text", path,
          buckets = 8)
      }
      (path, t)
    }
    bm25Stream(); val (wb, _) = bm25Batch(); Similarity.rmTree(new java.io.File(wb))
    val tBs = bm25Stream()
    val (bb, tBb) = bm25Batch()
    val (_, tBserve) = timed(
      Vocabulary.bm25Disk(spark, bb, Seq("apple", "banana"), topK = 10,
        buckets = 8).collect())
    Similarity.rmTree(new java.io.File(bb))
    println(f"[epochs] bm25_append: stream=$tBs%.2fs batch=$tBb%.2fs " +
      f"serve=$tBserve%.2fs machinery=${tBs - tBb}%.2fs")

    spark.stop()
  }
}
