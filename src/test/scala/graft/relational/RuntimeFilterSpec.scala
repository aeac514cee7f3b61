package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("bloom semi-filter keeps every true match (no false negatives)") {
    val probe = (0L until 10000L).map(i => (i, s"p$i")).toDF("k", "payload")
    val build = (0L until 10000L by 100).map(i => (i, s"b$i")).toDF("bk", "bval")
    val pruned = RuntimeFilter.bloomSemiFilter(probe, "k", build, "bk",
      expectedItems = 100)
    val keptKeys = pruned.select(col("k")).collect().map(_.getLong(0)).toSet
    (0L until 10000L by 100).foreach(k =>
      assert(keptKeys.contains(k), s"true match $k pruned — false negative"))
    // with fpp=0.01 the kept set should be close to the true 100 matches
    assert(keptKeys.size < 400, s"pruning ineffective: ${keptKeys.size} kept")
  }

  test("bloom-pruned join result equals the plain join") {
    val probe = (0L until 5000L).map(i => (i, i % 7)).toDF("k", "v")
    val build = (0L until 5000L by 50).map(i => (i, s"b$i")).toDF("bk", "bval")
    val plain = probe.join(build, col("k") === col("bk"))
      .orderBy(col("k")).collect().toSeq
    val pruned = RuntimeFilter.bloomPrunedJoin(probe, "k", build, "bk",
        expectedItems = 100)
      .orderBy(col("k")).collect().toSeq
    assert(pruned == plain)
  }

  test("null probe keys are pruned (they can never equi-join)") {
    val probe = Seq((java.lang.Long.valueOf(1L), "a"), (null.asInstanceOf[java.lang.Long], "b"))
      .toDF("k", "v")
    val build = Seq(Tuple1(1L)).toDF("bk")
    val kept = RuntimeFilter.bloomSemiFilter(probe, "k", build, "bk", 10)
      .collect()
    assert(kept.length == 1 && kept.head.getLong(0) == 1L)
  }
  test("non-integral keys are rejected (build/probe would hash differently)") {
    val probe = Seq((1L, "a")).toDF("k", "v")
    val build = Seq(Tuple1("1")).toDF("bk")
    val e = intercept[IllegalArgumentException] {
      RuntimeFilter.bloomSemiFilter(probe, "k", build, "bk", 10)
    }
    assert(e.getMessage.contains("integral"))
    val e2 = intercept[IllegalArgumentException] {
      RuntimeFilter.bloomSemiFilter(probe, "v", probe, "k", 10)
    }
    assert(e2.getMessage.contains("integral"))
  }

}
