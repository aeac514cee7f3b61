package graft.encode

import graft.SparkSpec

class MomentsSpec extends SparkSpec {
  import spark.implicits._

  test("population (not sample) standard deviation semantics") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val stats = Moments.compute(df, Seq("x"))("x")
    assert(stats.n == 4)
    assert(math.abs(stats.mean - 2.5) < 1e-12)
    // population σ of {1,2,3,4} = sqrt(1.25); sample σ would be sqrt(5/3)
    assert(math.abs(stats.stdPop - math.sqrt(1.25)) < 1e-12)
  }

  test("multiple columns aggregate in one job with per-path rows") {
    val df = Seq((1.0, 10.0), (3.0, 30.0)).toDF("a", "b")
    val rows = Moments.momentsFrame(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(rows("a") == ((2L, 2.0, 1.0)))
    assert(rows("b") == ((2L, 20.0, 10.0)))
  }

  test("nulls excluded from count and mean") {
    val df = Seq(Some(2.0), None, Some(4.0)).toDF("x")
    val stats = Moments.compute(df, Seq("x"))("x")
    assert(stats.n == 2)
    assert(stats.mean == 3.0)
  }

  test("constant column gets safeStd=1 so z-scoring stays finite") {
    val df = Seq(5.0, 5.0, 5.0).toDF("x")
    val stats = Moments.compute(df, Seq("x"))("x")
    assert(stats.stdPop == 0.0)
    assert(stats.safeStd == 1.0)
  }

  test("moments merge associativity: partials equal global") {
    // split the data across partitions; Catalyst partial+final combine
    // must equal a single-partition aggregate
    val data = (1 to 1000).map(_.toDouble)
    val many = spark.sparkContext.parallelize(data, 7).toDF("x")
    val one = spark.sparkContext.parallelize(data, 1).toDF("x")
    val a = Moments.compute(many, Seq("x"))("x")
    val b = Moments.compute(one, Seq("x"))("x")
    assert(a.n == b.n)
    assert(math.abs(a.mean - b.mean) < 1e-9)
    assert(math.abs(a.stdPop - b.stdPop) < 1e-9)
  }
}
