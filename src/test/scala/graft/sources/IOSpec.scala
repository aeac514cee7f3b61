package graft.sources

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class IOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_io").toString

  test("parquet write/read round trip") {
    val dir = tmp() + "/t"
    val df = Seq((1, "a"), (2, "b")).toDF("x", "s")
    IO.writeParquet(df, dir)
    val back = IO.readParquet(spark, dir).orderBy("x").collect()
    assert(back.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b")))
  }

  test("csv round trip with header") {
    val dir = tmp() + "/t"
    val df = Seq((1, "a"), (2, "b")).toDF("x", "s")
    IO.writeCsv(df, dir)
    val back = IO.readCsv(spark, dir).orderBy("x").collect()
    assert(back.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b")))
  }

  test("json round trip") {
    val dir = tmp() + "/t"
    val df = Seq((1, "a")).toDF("x", "s")
    IO.writeJson(df, dir)
    val back = IO.readJson(spark, dir).collect()
    assert(back.head.getAs[Long]("x") == 1L)
  }

  test("orc round trip") {
    val dir = tmp() + "/t"
    val df = Seq((1, "a"), (2, "b")).toDF("x", "s")
    IO.writeOrc(df, dir)
    val back = IO.readOrc(spark, dir).orderBy("x").collect()
    assert(back.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b")))
  }

  test("rowCount and display sink") {
    val df = Seq((1, "averylongstringvaluehere")).toDF("x", "s")
    assert(IO.rowCount(df) == 1)
    val shown = IO.display(df, truncate = 10)
    assert(shown.contains("x | s"))
    assert(shown.contains("…")) // truncation applied
  }

  test("partitioned write produces hive layout and prunes on read") {
    val dir = tmp() + "/t"
    val df = Seq((1, "2024-01-01", "x"), (2, "2024-01-02", "y"))
      .toDF("id", "dt", "v")
    IO.writePartitioned(df, dir, Seq("dt"))
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("dt="))
    assert(dirs.toSet == Set("dt=2024-01-01", "dt=2024-01-02"))
    val pruned = IO.readParquet(spark, dir).filter(col("dt") === "2024-01-01")
    assert(pruned.collect().map(_.getAs[Int]("id")).toSeq == Seq(1))
    // the pruned scan must only list the matching partition directory
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"), plan.take(400))
  }

  test("compact collapses a many-file directory to the target file count") {
    val src = tmp() + "/src"
    val dst = tmp() + "/dst"
    val df = (0 until 1000).map(i => (i, s"row$i")).toDF("x", "s")
    IO.writeParquet(df, src, partitions = Some(32)) // 32 tiny files
    val srcFiles = new java.io.File(src).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(srcFiles == 32)
    val rows = IO.compact(spark, src, dst, targetFiles = 4)
    assert(rows == 1000)
    val dstFiles = new java.io.File(dst).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(dstFiles == 4, s"expected 4 compacted files, got $dstFiles")
    // content preserved, not just count
    val back = IO.readParquet(spark, dst).orderBy("x")
      .collect().map(_.getInt(0)).toSeq
    assert(back == (0 until 1000))
  }

  test("writeParquet respects partition count") {
    val dir = tmp() + "/t"
    val df = (1 to 100).toDF("x").repartition(8)
    IO.writeParquet(df, dir, partitions = Some(2))
    val files = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 2)
  }
  test("compact refuses dstDir == srcDir (would delete the source mid-read)") {
    val dir = tmp() + "/same"
    (1 to 10).toDF("x").write.parquet(dir)
    val e = intercept[IllegalArgumentException] {
      IO.compact(spark, dir, dir, targetFiles = 1)
    }
    assert(e.getMessage.contains("differ"))
    // trailing slash is the same directory too
    intercept[IllegalArgumentException] {
      IO.compact(spark, dir, dir + "/", targetFiles = 1)
    }
    // source intact afterwards
    assert(spark.read.parquet(dir).count() == 10)
  }

  test("expirePartitions deletes exactly the partitions below the cutoff") {
    val dir = tmp() + "/t"
    Seq((1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-03"))
      .toDF("x", "day").write.partitionBy("day").parquet(dir)
    val deleted = IO.expirePartitions(spark, dir, "day", "2024-01-03")
    assert(deleted == Seq("2024-01-01", "2024-01-02"))
    val left = spark.read.parquet(dir).select("x")
      .collect().map(_.getInt(0)).toSeq
    assert(left == Seq(3))
    // idempotent: nothing left below the cutoff
    assert(IO.expirePartitions(spark, dir, "day", "2024-01-03").isEmpty)
  }

  test("writeSized picks partitions from the size estimate") {
    val dir = tmp() + "/sized"
    val df = (1 to 50000).toDF("x")
    // tiny target forces multiple files; content preserved
    val parts = IO.writeSized(df, dir, targetBytes = 64 * 1024)
    assert(parts > 1, s"expected multiple partitions, got $parts")
    val files = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == parts)
    assert(spark.read.parquet(dir).count() == 50000)
    // huge target collapses to one file
    assert(IO.writeSized(df, tmp() + "/sized2", targetBytes = 1L << 40) == 1)
  }

}
