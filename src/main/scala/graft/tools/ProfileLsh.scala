package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness for the multiprobe LSH join (BASELINE item:
  * sim_neardup_lsh regression). Times each pipeline stage separately
  * so the regression can be attributed instead of guessed at.
  */
object ProfileLsh {
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
    import graft.llm.Similarity
    import graft.functions.GraftFunctions
    import graft.sources.Tables

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val emb = Tables.embeddings(spark, sfDir)
    val n = time("count")(emb.count())
    val bits = Similarity.bitsFor(n)
    println(s"[profile] n=$n bits=$bits")

    val v = col("embedding").cast("array<double>")
    val planeSets = (0 until 8)
      .map(t => Similarity.hyperplanes(64, bits, s"lsh/t$t"))
    val sigCols = planeSets.zipWithIndex.map { case (planes, t) =>
      struct(lit(t).as("table"),
        Similarity.signature(v, planes).as("sig")).as(s"s$t")
    }
    val slim = emb
      .select(col("vec_id").as("id"), explode(array(sigCols: _*)).as("ts"))
      .select(col("ts.table").as("table"), col("ts.sig").as("sig"), col("id"))
    time("signature pass (slim index)")(slim.count())

    val probeCols = planeSets.zipWithIndex.map { case (planes, t) =>
      struct(lit(t).as("table"),
        GraftFunctions.hyperplaneProbes(v, planes, 3, 2).as("probes")).as(s"p$t")
    }
    val probes = emb
      .select(col("vec_id").as("id"), explode(array(probeCols: _*)).as("tp"))
      .select(col("tp.table").as("table"), col("id"),
        explode(col("tp.probes")).as("sig"))
    val np = time("probe pass")(probes.count())
    println(s"[profile] probe rows=$np")

    val buckets = slim.groupBy(col("table"), col("sig"))
      .agg(collect_list(col("id")).as("ids"))
    time("bucket build")(buckets.count())

    val candRaw = probes
      .select(col("table"), col("sig"), col("id").as("id_p"))
      .join(buckets, Seq("table", "sig"))
      .select(col("id_p"), explode(col("ids")).as("id_s"))
      .filter(col("id_p") =!= col("id_s"))
    val nc = time("candidate explode (pre-distinct)")(candRaw.count())
    println(s"[profile] raw candidate rows=$nc")

    val cand = candRaw
      .select(least(col("id_p"), col("id_s")).as("id_a"),
        greatest(col("id_p"), col("id_s")).as("id_b"))
      .distinct()
    val nd = time("distinct pairs")(cand.count())
    println(s"[profile] distinct pairs=$nd")

    time("full query end-to-end")(
      Similarity.similarityJoinMultiProbe(emb, "embedding", "vec_id",
        threshold = 0.5, dim = 64, bits = bits, tables = 8,
        flipBits = 3, probeHamming = 2).count())
    time("full query again (warm)")(
      Similarity.similarityJoinMultiProbe(emb, "embedding", "vec_id",
        threshold = 0.5, dim = 64, bits = bits, tables = 8,
        flipBits = 3, probeHamming = 2).count())

    // Variant B: pack the pair into one long before distinct
    val candPacked = candRaw
      .select((shiftleft(least(col("id_p"), col("id_s")), 32)
        .bitwiseOR(greatest(col("id_p"), col("id_s")))).as("pk"))
      .distinct()
      .select((col("pk") / lit(4294967296L)).cast("long").as("id_a"),
        col("pk").bitwiseAND(lit(4294967295L)).as("id_b"))
    time("B: packed-long distinct")(candPacked.count())

    // Variant C: score raw candidates (no pre-distinct), dedup survivors
    val vecs = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("vec"))
    val scored = candRaw
      .select(least(col("id_p"), col("id_s")).as("id_a"),
        greatest(col("id_p"), col("id_s")).as("id_b"))
      .join(broadcast(vecs.select(col("id").as("id_a"), col("vec").as("vec_a"))), Seq("id_a"))
      .join(broadcast(vecs.select(col("id").as("id_b"), col("vec").as("vec_b"))), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosineNative(col("vec_a"), col("vec_b")).as("score"))
      .filter(col("score") >= 0.5)
      .groupBy(col("id_a"), col("id_b")).agg(first(col("score")).as("score"))
    time("C: score-then-dedup (broadcast vecs)")(scored.count())
    time("C again (warm)")(scored.count())
    spark.stop()
  }
}
