package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinMaxSkipIndexSpec extends SparkSpec {
  import spark.implicits._

  test("range-clustered layout: narrow ranges scan few files") {
    val n = 20000
    val df = (0 until n).map(i => (i.toLong, i % 7)).toDF("k", "payload")
    val tbl = java.nio.file.Files.createTempDirectory("mmtbl")
      .toString + "/tbl"
    df.repartitionByRange(8, col("k")).sortWithinPartitions(col("k"))
      .write.parquet(tbl)
    val idx = java.nio.file.Files.createTempDirectory("mmidx")
      .toString + "/idx"
    MinMaxSkipIndex.build(spark, tbl, "k", idx)

    // a 5% range on a range-clustered 8-file layout overlaps ≤2
    // envelopes (range boundaries may straddle one file edge)
    val (res, cand, total) = MinMaxSkipIndex.lookupRange(spark, tbl, idx,
      "k", 10000L, 10999L)
    assert(total == 8, s"expected 8 files, got $total")
    assert(cand <= 2, s"range-clustered lookup scanned $cand/$total files")
    assert(res.count() == 1000L)
    // result equals the full-scan filter exactly
    val viaIndex = res.select(col("k")).collect().map(_.getLong(0)).sorted
    assert(viaIndex.head == 10000L && viaIndex.last == 10999L &&
      viaIndex.length == 1000)
  }

  test("out-of-domain range prunes every file; result is empty") {
    val df = (0 until 1000).map(i => (i.toLong, i)).toDF("k", "payload")
    val tbl = java.nio.file.Files.createTempDirectory("mmtbl")
      .toString + "/tbl"
    df.repartitionByRange(4, col("k")).sortWithinPartitions(col("k"))
      .write.parquet(tbl)
    val idx = java.nio.file.Files.createTempDirectory("mmidx")
      .toString + "/idx"
    MinMaxSkipIndex.build(spark, tbl, "k", idx)
    val (res, cand, total) = MinMaxSkipIndex.lookupRange(spark, tbl, idx,
      "k", 5000L, 6000L)
    assert(cand == 0 && total == 4)
    assert(res.count() == 0L)
  }

  test("random layout: zone maps skip nothing but stay correct") {
    // layout by a column uncorrelated with k — every file's envelope
    // spans the domain, so every file is a candidate (the honesty
    // property; this is the case BloomSkipIndex exists for)
    val df = (0 until 8000).map(i => (i.toLong, (i * 2654435761L) % 97))
      .toDF("k", "grp")
    val tbl = java.nio.file.Files.createTempDirectory("mmtbl")
      .toString + "/tbl"
    df.repartition(8, col("grp")).write.parquet(tbl)
    val idx = java.nio.file.Files.createTempDirectory("mmidx")
      .toString + "/idx"
    MinMaxSkipIndex.build(spark, tbl, "k", idx)
    val (res, cand, total) = MinMaxSkipIndex.lookupRange(spark, tbl, idx,
      "k", 4000L, 4099L)
    assert(cand == total, s"random layout should not prune ($cand/$total)")
    assert(res.count() == 100L)
  }
}
