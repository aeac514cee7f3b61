package graft.relational

import graft.SparkSpec

class ZipSpec extends SparkSpec {

  test("narrow path: same layout zips positionally without shuffle") {
    val sc = spark.sparkContext
    val a = sc.parallelize(1 to 8, 4)
    val b = sc.parallelize(11 to 18, 4)
    val zipped = Zip.zipRdds(Seq(a, b)).collect()
    assert(zipped.toSeq == (1 to 8).map(i => Seq(i, i + 10)))
  }

  test("fallback path: different partition layouts still zip by index") {
    val sc = spark.sparkContext
    val a = sc.parallelize(1 to 8, 4)
    val b = sc.parallelize(11 to 18, 2)
    val zipped = Zip.zipRdds(Seq(a, b)).collect()
    // index join restores positional identity; order of result rows is
    // unspecified, so compare as a set of pairs
    assert(zipped.map(s => (s(0), s(1))).toSet ==
      (1 to 8).map(i => (i, i + 10)).toSet)
  }

  test("unequal total counts raise eagerly, never truncate") {
    val sc = spark.sparkContext
    val a = sc.parallelize(1 to 8, 4)
    val b = sc.parallelize(1 to 7, 4)
    val e = intercept[IllegalArgumentException](Zip.zipRdds(Seq(a, b)))
    assert(e.getMessage.contains("equal row counts"))
  }

  test("equal counts but different per-partition sizes use the join path") {
    val sc = spark.sparkContext
    // same partition count, different element distribution: the narrow
    // RDD.zip would fail at action time; the probe must route to the join
    val a = sc.makeRDD(Seq(Seq(1, 2, 3), Seq(4)).flatten, 1)
      .repartition(2)
    val b = sc.parallelize(11 to 14, 2)
    val la = Zip.partitionSizes(a)
    val lb = Zip.partitionSizes(b)
    val zipped = Zip.zipRdds(Seq(a, b)).collect()
    assert(zipped.length == 4) // completes without task failure
  }

  test("zipFrames concatenates schemas and aligns rows") {
    import spark.implicits._
    val left = Seq((1, "a"), (2, "b")).toDF("x", "s")
    val right = Seq(10.5, 20.5).toDF("y")
    val out = Zip.zipFrames(spark, left, right)
    assert(out.columns.toSeq == Seq("x", "s", "y"))
    val rows = out.collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows == Set((1, "a", 10.5), (2, "b", 20.5)))
  }

  test("zipLocal transposes and rejects ragged input") {
    assert(Zip.zipLocal(Seq(Seq(1, 2), Seq(3, 4))) == Seq(Seq(1, 3), Seq(2, 4)))
    intercept[IllegalArgumentException](Zip.zipLocal(Seq(Seq(1), Seq(2, 3))))
  }
}
