package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomSkipIndexSpec extends SparkSpec {
  import spark.implicits._

  test("bloom sidecar skips files for point lookups, no false negatives") {
    // 16 files laid out by a column UNCORRELATED with the lookup key:
    // min/max stats can't prune, the bloom must
    val n = 20000
    val df = (0 until n).map(i => (i.toLong, (i * 2654435761L) % 97))
      .toDF("k", "grp")
    val tbl = java.nio.file.Files.createTempDirectory("bloomtbl")
      .toString + "/tbl"
    df.repartition(16, col("grp")).write.parquet(tbl)
    val idx = java.nio.file.Files.createTempDirectory("bloomidx")
      .toString + "/idx"
    BloomSkipIndex.build(spark, tbl, "k", idx,
      expectedPerFile = n / 8, fpp = 0.01)

    // every present key is FOUND (no false negatives, the bloom
    // guarantee) and reads a small candidate set
    Seq(0L, 1L, 9999L, (n - 1).toLong).foreach { key =>
      val (res, cand, total) = BloomSkipIndex.lookup(spark, tbl, idx,
        "k", key)
      assert(total == 16, s"expected 16 files, got $total")
      assert(res.collect().map(_.getLong(0)).toSeq == Seq(key))
      assert(cand < total,
        s"bloom skipped nothing for key=$key ($cand/$total)")
    }
    // an absent key usually prunes everything; correctness holds
    // regardless of how many false-positive files get scanned
    val (resAbs, candAbs, _) = BloomSkipIndex.lookup(spark, tbl, idx,
      "k", 999999999L)
    assert(resAbs.count() == 0)
    assert(candAbs <= 2, s"absent key matched $candAbs files (fpp=0.01)")
  }

  test("lookup equals the full-scan filter on a multi-row key") {
    val df = (0 until 5000).map(i => ((i % 50).toLong, i))
      .toDF("k", "payload")
    val tbl = java.nio.file.Files.createTempDirectory("bloomtbl")
      .toString + "/tbl"
    df.repartition(8, col("payload")).write.parquet(tbl)
    val idx = java.nio.file.Files.createTempDirectory("bloomidx")
      .toString + "/idx"
    BloomSkipIndex.build(spark, tbl, "k", idx, expectedPerFile = 1000)
    val (res, _, _) = BloomSkipIndex.lookup(spark, tbl, idx, "k", 7L)
    val viaIndex = res.select(col("payload"))
      .collect().map(_.getInt(0)).sorted.toSeq
    val fullScan = spark.read.parquet(tbl).filter(col("k") === 7L)
      .select(col("payload")).collect().map(_.getInt(0)).sorted.toSeq
    assert(viaIndex == fullScan && viaIndex.nonEmpty)
  }
}
