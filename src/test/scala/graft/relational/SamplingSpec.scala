package graft.relational

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("seeded sample is reproducible") {
    val df = (1 to 1000).toDF("x")
    val a = Sampling.sample(df, 0.1, seed = 7).collect().map(_.getInt(0)).toSeq
    val b = Sampling.sample(df, 0.1, seed = 7).collect().map(_.getInt(0)).toSeq
    assert(a == b)
    assert(a.nonEmpty && a.length < 400)
  }

  test("seeded randomSplit partitions all rows exactly once") {
    val df = (1 to 1000).toDF("x")
    val Array(l, r) = Sampling.randomSplit(df, Array(0.9, 0.1), seed = 7)
    assert(l.count() + r.count() == 1000)
  }

  test("partition heuristic matches reference formula") {
    assert(Sampling.partitionsForRows(100000) == 10)
    assert(Sampling.partitionsForRows(5) == 2) // min 2
    assert(Sampling.partitionsForRows(1000000, 50000) == 20)
  }

  test("microBatches yields all rows in order without full collect") {
    val df = (1 to 25).toDF("x").coalesce(1)
    val batches = Sampling.microBatches(df, 10).toSeq
    assert(batches.map(_.size) == Seq(10, 10, 5))
    assert(batches.flatten.map(_.getInt(0)) == (1 to 25))
  }

  test("withPersist unpersists even when body throws") {
    val df = (1 to 10).toDF("x")
    intercept[RuntimeException] {
      Caching.withPersist(df)(_ => throw new RuntimeException("boom"))
    }
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }
}
