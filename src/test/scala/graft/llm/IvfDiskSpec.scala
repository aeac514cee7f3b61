package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfDiskSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0 until 300).map { i =>
    val a = i % 3 // three well-separated directions
    val base = Array.tabulate(8)(j => if (j == a) 1.0 else 0.0)
    (i.toLong, base.map(_ + 0.01 * ((i * 7 + a) % 5)).toSeq)
  }.toDF("id", "vec")

  test("disk round-trip probe equals the in-memory probe exactly") {
    val df = corpus
    val cents = Similarity.kmeansCentroids(df, "vec", "id", k = 3, iters = 2)
    val mem = Similarity.ivfIndex(df, "vec", "id", cents).persist()
    val dir = Files.createTempDirectory("ivf").toString + "/idx"
    Similarity.writeIvfIndex(mem, dir)
    val disk = Similarity.readIvfIndex(spark, dir)
    val query = Array.tabulate(8)(j => if (j == 0) 1.0 else 0.1)
    val radii = Similarity.cellRadii(mem, cents)

    def ids(idx: org.apache.spark.sql.DataFrame) =
      Similarity.topKIvfExact(idx, query, cents, radii, k = 5, nprobe = 1)
        .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
        .toSeq
    assert(ids(disk) == ids(mem))
    mem.unpersist(): Unit
  }

  test("cell filter on the disk index is partition-pruned at file level") {
    val df = corpus
    val cents = Similarity.kmeansCentroids(df, "vec", "id", k = 3, iters = 2)
    val dir = Files.createTempDirectory("ivf").toString + "/idx"
    Similarity.writeIvfIndex(
      Similarity.ivfIndex(df, "vec", "id", cents), dir)
    val pruned = Similarity.readIvfIndex(spark, dir)
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
