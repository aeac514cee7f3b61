package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfPqDiskSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0 until 300).map { i =>
    val a = i % 3 // three well-separated directions
    val base = Array.tabulate(8)(j => if (j == a) 1.0 else 0.0)
    (i.toLong, base.map(_ + 0.01 * ((i * 7 + a) % 5)).toSeq)
  }.toDF("id", "vec")

  private def build() = {
    val df = corpus
    val cents = Similarity.kmeansCentroids(df, "vec", "id", k = 3, iters = 2)
    val model = Pq.trainCodebooks(df, "vec", "id", dim = 8, m = 4, k = 16,
      iters = 2)
    val index = Pq.ivfPqIndex(df, "vec", "id", cents, model).persist()
    val radii = Similarity.cellRadii(
      index.join(df.select(col("id"),
        col("vec").cast("array<double>").as("vec")), "id"), cents)
    (df, cents, model, index, radii)
  }

  test("disk round-trip serves the same top-k as the in-memory index") {
    val (df, cents, model, index, radii) = build()
    val dir = Files.createTempDirectory("ivfpq").toString + "/idx"
    Pq.writeIvfPqIndex(index, dir, model, cents, radii)
    val disk = Pq.readIvfPqIndex(spark, dir)

    // the sidecars round-trip the exact driver-side metadata
    assert(disk.model.dim == model.dim && disk.model.m == model.m &&
      disk.model.k == model.k)
    assert(disk.model.codebooks.flatten.flatten.toSeq ==
      model.codebooks.flatten.flatten.toSeq)
    assert(disk.centroids.flatten.toSeq == cents.flatten.toSeq)
    assert(disk.radii.toSeq == radii.toSeq)

    val query = Array.tabulate(8)(j => if (j == 0) 1.0 else 0.1)
    def ids(idx: org.apache.spark.sql.DataFrame) =
      Pq.topKIvfPq(idx, df, "vec", "id", query, model, cents, radii,
          k = 5, nprobe = 1, shortlist = 20)
        .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
        .toSeq
    assert(ids(disk.codes) == ids(index))
    index.unpersist(): Unit
  }

  test("cell filter on the disk codes is partition-pruned at file level") {
    val (_, cents, model, index, radii) = build()
    val dir = Files.createTempDirectory("ivfpq").toString + "/idx"
    Pq.writeIvfPqIndex(index, dir, model, cents, radii)
    index.unpersist()
    val pruned = Pq.readIvfPqIndex(spark, dir).codes
      .filter(col("cell") === 1)
    pruned.collect()
    val scan = walkExecutedPlan(pruned.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
    assert(scan.nonEmpty, "no file scan found")
    assert(scan.head.partitionFilters.nonEmpty,
      s"cell filter did not reach partition pruning:\n${scan.head}")
    // only cell=1's directory is actually read
    assert(scan.head.relation.location
      .listFiles(scan.head.partitionFilters, Nil)
      .forall(_.values.getInt(0) == 1))
  }
}
