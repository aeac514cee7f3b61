package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{Pq, Similarity}
import graft.sources.Tables

/** Focused ×1/×10/×30 probe for the IVF(×PQ) disk-append verb — the
  * one index verb ScaleProbe measured super-linear in round 10
  * (1.40 s → 2.41 s at ×10 as `cellsFor` grew 7 → 78 cells): the
  * delta-assignment term was O(delta·cells·dim). Round 12 routes
  * assignment through [[graft.functions.NearestCentroidCoarseExpr]]
  * above 64 cells (triangle-inequality two-level search, bit-identical
  * answers — CoarseCentroidSpec); this probe pins the wall shape.
  * Protocol matches ScaleProbe's ivfpq_append stage exactly (same
  * master/shuffle config, same fixture blowup, same fixed-size delta)
  * so rows are comparable with BASELINE.md's round-10 table.
  */
object ProbeIndexAppend {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val mults = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 10, 30)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    mults.foreach { mult =>
      val emb0 = Tables.embeddings(spark, sfDir)
      val emb = (if (mult == 1) emb0
        else emb0
          .select(col("vec_id"), col("embedding"),
            explode(sequence(lit(0), lit(mult - 1))).as("copy"))
          .select((col("vec_id") * mult + col("copy")).as("vec_id"),
            col("embedding")))
        .persist()
      val nVecs = emb.count()
      val cells = Similarity.cellsFor(nVecs)
      val cents = Similarity.kmeansCentroids(emb, "embedding", "vec_id",
        k = cells, iters = 1)
      val model = Pq.trainCodebooks(emb, "embedding", "vec_id",
        dim = 64, m = 16, k = 64, iters = 1)
      val fixedDelta = Tables.embeddings(spark, sfDir)
        .select((col("vec_id") + lit(10L) * nVecs).as("vec_id"),
          col("embedding"))
      val deltaN = fixedDelta.count()

      // ---- IVF×PQ append (the round-10 super-linear row)
      {
        val dir = java.nio.file.Files
          .createTempDirectory("probe_ivfpq").toString + "/idx"
        val baseIdx = Pq.ivfPqIndex(emb, "embedding", "vec_id", cents,
          model).persist()
        val radii = Similarity.cellRadii(
          baseIdx.join(emb.select(col("vec_id").as("id"),
            col("embedding").cast("array<double>").as("vec")), "id"),
          cents)
        Pq.writeIvfPqIndex(baseIdx, dir, model, cents, radii)
        baseIdx.unpersist(blocking = false)
        val (_, tApp) = timed(Pq.appendIvfPqIndex(spark, fixedDelta,
          "embedding", "vec_id", dir))
        println(f"[probe] emb x$mult ivfpq_append cells=$cells " +
          f"delta=$deltaN time=$tApp%.2fs")

        // stage-attribution mode: where does the append wall actually
        // go as cells grow? (assignment vs file-metadata vs sidecars)
        if (sys.env.contains("PROBE_BREAKDOWN")) {
          import graft.llm.IndexManifest
          val (idx, tRead) = timed(Pq.readIvfPqIndex(spark, dir))
          val ((v2, staged2), tStage) = timed(IndexManifest.stage(dir))
          val (_, tCarry) = timed {
            IndexManifest.carry(dir, staged2, "codes")
            IndexManifest.carry(dir, staged2, "codes_delta")
            IndexManifest.carry(dir, staged2, "codebooks")
            IndexManifest.carry(dir, staged2, "params")
            IndexManifest.carry(dir, staged2, "tombstones")
          }
          val assigned = Pq.normalized(fixedDelta, "embedding", "vec_id",
              idx.model.dim)
            .select(col("id"),
              graft.functions.GraftFunctions.nearestCentroid(col("nv"),
                idx.centroids).cast("int").as("cell"),
              col("nv"))
            .persist()
          val (_, tAssign) = timed(assigned.count())
          val (_, tWrite) = timed(
            assigned.select(col("id"),
                graft.functions.GraftFunctions.pqPack(
                  graft.functions.GraftFunctions.pqEncode(col("nv"),
                    idx.model.codebooks)).as("codes"),
                col("cell"))
              .filter(col("codes").isNotNull)
              .repartition(col("cell")).sortWithinPartitions(col("cell"))
              .write.mode("append")
              .parquet(s"$staged2/codes_delta"))
          val (_, tRadii) = timed {
            val deltaMax = Similarity.cellMaxAngles(
              assigned.select(col("id"), col("cell"))
                .join(fixedDelta.select(col("vec_id").as("id"),
                  col("embedding").cast("array<double>").as("vec")), "id")
                .select(col("cell"), col("vec")),
              idx.centroids)
            val widened = idx.radii.zipWithIndex.map { case (r, c) =>
              math.max(r, deltaMax.getOrElse(c, r)) }
            import spark.implicits._
            idx.centroids.indices.map(i =>
                (i, idx.centroids(i).toSeq, widened(i)))
              .toDF("cell", "centroid", "radius")
              .coalesce(1).write.mode("overwrite")
              .parquet(s"$staged2/centroids")
          }
          val (_, tCommit) = timed(IndexManifest.commit(dir, v2))
          assigned.unpersist(blocking = false)
          println(f"[probe] emb x$mult ivfpq_append_breakdown " +
            f"read=$tRead%.2fs stage=$tStage%.2fs carry=$tCarry%.2fs " +
            f"assign=$tAssign%.2fs write=$tWrite%.2fs " +
            f"radii=$tRadii%.2fs commit=$tCommit%.2fs")
        }
      }

      // ---- IVF (plain) append: same assignment term, no PQ encode
      {
        val dir = java.nio.file.Files
          .createTempDirectory("probe_ivf").toString + "/idx"
        val ivf = Similarity.ivfIndex(emb, "embedding", "vec_id", cents)
        Similarity.writeIvfIndex(ivf, dir)
        val (_, tApp) = timed(Similarity.appendIvfIndex(fixedDelta,
          "embedding", "vec_id", dir, cents))
        println(f"[probe] emb x$mult ivf_append cells=$cells " +
          f"delta=$deltaN time=$tApp%.2fs")
      }

      emb.unpersist()
    }
    spark.stop()
  }
}
