package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness: stage attribution for the cold IVF+PQ build
  * behind sim_topk_ivfpq (the slowest bench entry after round 8).
  */
object ProfileIvfPq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.{Pq, Similarity}
    import graft.sources.Tables

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivfpq] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val emb = Tables.embeddings(spark, sfDir)
    val query = time("query collect")(
      emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .collect().head.getSeq[Double](0).toArray)
    val model = time("pq trainCodebooks (m=16 k=64 iters=2)")(
      Pq.trainCodebooks(emb, "embedding", "vec_id", query.length,
        m = 16, k = 64, iters = 2))
    val n = emb.count()
    val cents = time("ivf kmeansCentroids (iters=2)")(
      Similarity.kmeansCentroids(emb, "embedding", "vec_id",
        k = Similarity.cellsFor(n), iters = 2))
    val index = time("ivfPqIndex build+persist")({
      val i = Pq.ivfPqIndex(emb, "embedding", "vec_id", cents, model).persist()
      i.count(); i
    })
    val radii = time("cellRadii")(
      Similarity.cellRadii(
        index.join(emb.select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec")), "id"), cents))
    time("topKIvfPq query")(
      Pq.topKIvfPq(index, emb, "embedding", "vec_id", query, model,
        cents, radii, k = 10, nprobe = math.max(2, cents.length / 4),
        shortlist = 100).count())
    spark.stop()
  }
}
