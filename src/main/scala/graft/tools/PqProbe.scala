package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.llm.{Pq, Similarity}
import graft.sources.Tables

/** Scratch probe: PQ recall/error at fixture scale (not part of the
  * driver contract).
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.get()
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    val dim = query.length

    for (m <- Seq(8, 16); k <- Seq(16, 32, 64); iters <- Seq(2)) {
      val t0 = System.nanoTime()
      val model = Pq.trainCodebooks(emb, "embedding", "vec_id", dim, m, k, iters)
      val idx = Pq.pqIndex(emb, "embedding", "vec_id", model).persist()
      idx.count()
      val t1 = System.nanoTime()

      val brute = Similarity.topKBrute(emb, "embedding", "vec_id", query, 10)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      def recallAt(shortlist: Int): Double = {
        val got = Pq.topKRerank(idx, emb, "embedding", "vec_id", query,
          model, 10, shortlist).select(col("vec_id")).collect()
          .map(_.getLong(0)).toSet
        got.intersect(brute).size / 10.0
      }
      // ADC score vs true cosine, mean abs error over the corpus
      val lut = Pq.adcLut(query, model)
      val qc = array(query.map(lit).toIndexedSeq: _*)
      val err = idx.join(emb, idx("id") === emb("vec_id"))
        .select(abs(graft.functions.GraftFunctions.pqAdc(col("codes"), lut, model.k) -
          graft.functions.GraftFunctions.cosine(col("embedding").cast("array<double>"), qc)).as("e"))
        .agg(avg("e"), max("e")).collect().head
      println(f"PQPROBE n=$n m=$m k=$k iters=$iters " +
        f"train_s=${(t1 - t0) / 1e9}%.2f " +
        f"recall50=${recallAt(50)}%.2f recall100=${recallAt(100)}%.2f " +
        f"recall20=${recallAt(20)}%.2f " +
        f"adc_mae=${err.getDouble(0)}%.4f adc_maxe=${err.getDouble(1)}%.4f")
      idx.unpersist()
    }
    spark.stop()
  }
}
