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

  test("append encodes against frozen artifacts, widens radii exactly, " +
      "leaves base files untouched; compact collapses files") {
    val df = corpus
    val hist = df.filter(col("id") < 200)
    val delta = df.filter(col("id") >= 200)
    // history-trained, frozen artifacts
    val cents = Similarity.kmeansCentroids(hist, "vec", "id", k = 3,
      iters = 2)
    val model = Pq.trainCodebooks(hist, "vec", "id", dim = 8, m = 4,
      k = 16, iters = 2)
    val histIdx = Pq.ivfPqIndex(hist, "vec", "id", cents, model).persist()
    val histRadii = Similarity.cellRadii(
      histIdx.join(hist.select(col("id"),
        col("vec").cast("array<double>").as("vec")), "id"), cents)
    val dir = Files.createTempDirectory("ivfpq").toString + "/idx"
    Pq.writeIvfPqIndex(histIdx, dir, model, cents, histRadii)
    histIdx.unpersist()

    // name-keyed: versions carry base code files as hard links (same
    // name, same inode mtime), so survival is visible across versions
    def filesUnder(sub: String) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(s"${IndexManifest.currentDir(dir)}/$sub"))
        .map(f => f.getName -> f.lastModified).toMap
    }
    def dataFiles = filesUnder("codes") ++ filesUnder("codes_delta")
    val before = dataFiles
    Pq.appendIvfPqIndex(spark, delta, "vec", "id", dir)
    val after = dataFiles
    // append only ADDS code files: every base file survives untouched,
    // and the new rows land as LEVEL-0 delta files, never inside the
    // `cell=` base layout (that fan-out is what made the verb
    // super-linear in the round-10 probe)
    assert(before.toSet.subsetOf(after.toSet),
      "append rewrote or removed base code files")
    assert(after.size > before.size, "append wrote no new code files")
    assert(filesUnder("codes") == before,
      "append fanned delta rows into the partitioned base layout")
    assert(filesUnder("codes_delta").nonEmpty,
      "append wrote no level-0 delta files")

    val disk = Pq.readIvfPqIndex(spark, dir)
    // appended codes are byte-identical to encoding the full corpus
    // against the SAME frozen artifacts (arrival never retrains)
    val expectIdx = Pq.ivfPqIndex(df, "vec", "id", cents, model)
    def codesKey(f: org.apache.spark.sql.DataFrame) = f.collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]]("codes").toSeq,
        r.getAs[Number]("cell").intValue)).sortBy(_._1).toSeq
    assert(codesKey(disk.codes) == codesKey(expectIdx))
    // widened radii == full recompute over base+delta (max-merge is
    // exact, untouched cells keep their old radius)
    val expectRadii = Similarity.cellRadii(
      expectIdx.join(df.select(col("id"),
        col("vec").cast("array<double>").as("vec")), "id"), cents)
    assert(disk.radii.toSeq == expectRadii.toSeq,
      s"radii ${disk.radii.toSeq} != recompute ${expectRadii.toSeq}")
    assert(disk.radii.zip(histRadii).forall { case (r2, r1) => r2 >= r1 })

    // serve equality across compaction + file-count collapse
    val query = Array.tabulate(8)(j => if (j == 1) 1.0 else 0.1)
    def serve(idx: Pq.IvfPqDiskIndex) =
      Pq.topKIvfPq(idx.codes, df, "vec", "id", query, idx.model,
          idx.centroids, idx.radii, k = 5, nprobe = 1, shortlist = 40)
        .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
        .toSeq
    val servedBefore = serve(disk)
    Pq.compactIvfPqIndex(spark, dir)
    val compacted = Pq.readIvfPqIndex(spark, dir)
    assert(dataFiles.size < after.size, "compaction did not shrink files")
    assert(codesKey(compacted.codes) == codesKey(expectIdx))
    assert(serve(compacted) == servedBefore)
  }

  test("delete tombstones fold at read; compaction removes the bytes " +
      "bit-identically to a rebuild over survivors") {
    val (df, cents, model, index, radii) = build()
    val dir = Files.createTempDirectory("ivfpqdel").toString + "/idx"
    Pq.writeIvfPqIndex(index, dir, model, cents, radii)
    index.unpersist()
    Pq.deleteFromIvfPqIndex(df.filter(col("id") % 5 === 0), "id", dir)
    def codesKey(f: org.apache.spark.sql.DataFrame) = f.collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]]("codes").toSeq,
        r.getAs[Number]("cell").intValue)).sortBy(_._1).toSeq
    val disk = Pq.readIvfPqIndex(spark, dir)
    // the served codes equal an index built over the survivors with
    // the SAME frozen artifacts (PQ encoding is per-row)
    val survivors = df.filter(col("id") % 5 =!= 0)
    val expectIdx = Pq.ivfPqIndex(survivors, "vec", "id", cents, model)
    assert(codesKey(disk.codes) == codesKey(expectIdx))
    // serve: deleted ids absent, ranks equal the survivor rebuild
    val query = Array.tabulate(8)(j => if (j == 0) 1.0 else 0.1)
    def serve(idx: Pq.IvfPqDiskIndex) =
      Pq.topKIvfPq(idx.codes, survivors, "vec", "id", query, idx.model,
          idx.centroids, idx.radii, k = 5, nprobe = 3, shortlist = 40)
        .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
        .toSeq
    val served = serve(disk)
    assert(served.forall(_._1 % 5 != 0), s"deleted id served: $served")
    val expect = Pq.topKIvfPq(expectIdx, survivors, "vec", "id", query,
        model, cents, radii, k = 5, nprobe = 3, shortlist = 40)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
      .toSeq
    assert(served == expect, s"served=$served expect=$expect")
    // compaction folds the bytes: tombstone artifact gone, codes rows
    // physically absent, serve bit-identical
    Pq.compactIvfPqIndex(spark, dir)
    assert(!new java.io.File(
      s"${IndexManifest.currentDir(dir)}/tombstones").exists(),
      "compaction left the tombstone artifact behind")
    val compacted = Pq.readIvfPqIndex(spark, dir)
    assert(codesKey(compacted.codes) == codesKey(expectIdx))
    assert(serve(compacted) == expect)
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
