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

  test("append to history-trained cells serves exactly, base files untouched") {
    val df = corpus
    val hist = df.filter(col("id") % 10 =!= 0)
    val delta = df.filter(col("id") % 10 === 0)
    // centroids from HISTORY only — arrival never retrains
    val cents = Similarity.kmeansCentroids(hist, "vec", "id", k = 3, iters = 2)
    val dir = Files.createTempDirectory("ivf").toString + "/idx"
    Similarity.writeIvfIndex(
      Similarity.ivfIndex(hist, "vec", "id", cents), dir)
    // name-keyed: versions carry base files as hard links (same name,
    // same inode mtime), so survival across version dirs is visible
    def dataFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(dir)).map(f => f.getName -> f.lastModified).toMap
    }
    val before = dataFiles
    Similarity.appendIvfIndex(delta, "vec", "id", dir, cents)
    val after = dataFiles
    assert(before.toSet.subsetOf(after.toSet),
      "append rewrote or removed base files")
    assert(after.size > before.size, "append wrote no new files")
    // radii over base+delta keep branch-and-bound EXACT: equals brute
    // force over the full corpus
    val disk = Similarity.readIvfIndex(spark, dir)
    val radii = Similarity.cellRadii(disk, cents)
    val query = Array.tabulate(8)(j => if (j == 2) 1.0 else 0.07)
    val served = Similarity.topKIvfExact(disk, query, cents, radii,
        k = 5, nprobe = 1)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
      .toSeq
    val brute = Similarity.topKBrute(df, "vec", "id", query, k = 5)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
      .toSeq
    assert(served == brute, s"served=$served brute=$brute")
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

  test("delete tombstones fold on read; compaction removes the bytes") {
    val df = corpus
    val cents = Similarity.kmeansCentroids(df, "vec", "id", k = 3, iters = 2)
    val dir = Files.createTempDirectory("ivfdel").toString + "/idx"
    Similarity.writeIvfIndex(
      Similarity.ivfIndex(df, "vec", "id", cents), dir)
    def dataNames = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(s"${IndexManifest.currentDir(dir)}/data"))
        .map(f => f.getName -> f.lastModified).toSet
    }
    val baseFiles = dataNames
    Similarity.deleteFromIvfIndex(
      df.filter(col("id") % 5 === 0), "id", dir)
    // data files untouched — the delete carries them as hard links
    // and only adds the tombstone artifact
    assert(dataNames == baseFiles)
    val query = Array.tabulate(8)(j => if (j == 0) 1.0 else 0.1)
    def serve() = {
      val disk = Similarity.readIvfIndex(spark, dir)
      val radii = Similarity.cellRadii(disk, cents)
      Similarity.topKIvfExact(disk, query, cents, radii, k = 5,
          nprobe = 3)
        .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
        .toSeq
    }
    val served = serve()
    // equals a from-scratch serve over the surviving corpus
    val survivors = df.filter(col("id") % 5 =!= 0)
    val mem = Similarity.ivfIndex(survivors, "vec", "id", cents).persist()
    val expect = Similarity.topKIvfExact(mem, query, cents,
        Similarity.cellRadii(mem, cents), k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
      .toSeq
    assert(served == expect, s"served=$served expect=$expect")
    assert(served.forall(_._1 % 5 != 0))
    // compaction folds physically: sidecar gone, serve unchanged
    Similarity.compactIvfIndex(spark, dir)
    assert(!new java.io.File(
      s"${IndexManifest.currentDir(dir)}/tombstones").exists())
    assert(serve() == expect)
    mem.unpersist(): Unit
  }
}
