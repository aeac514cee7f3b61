package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: x even positions, y odd") {
    // x=5 (101): bits at z-positions 0,4 -> 17; y=3 (011): z-positions 1,3 -> 10
    val z = Seq((5, 3)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), bits = 3))
      .collect().head.getLong(0)
    assert(z == 27L)
  }

  test("zValue matches the generated SQL form on random inputs") {
    val df = spark.range(500).select(
      (col("id") * 2654435761L % 256).as("x"),
      (col("id") * 40503L % 256).as("y"))
    df.createOrReplaceTempView("zin")
    val viaExpr = df.select(col("x"), col("y"),
      ZOrder.zValue(col("x"), col("y")).as("z"))
    val viaSql = spark.sql(
      s"SELECT x, y, ${ZOrder.zValueSql("x", "y")} AS z FROM zin")
    assert(viaExpr.exceptAll(viaSql).isEmpty && viaSql.exceptAll(viaExpr).isEmpty)
  }

  test("clusterByZ yields disjoint per-partition z ranges (the pruning property)") {
    val df = spark.range(2000).select(
      (col("id") % 250).as("x"), ((col("id") * 7) % 250).as("y"))
    val clustered = ZOrder.clusterByZ(df, "x", "y", numPartitions = 8)
    val ranges = clustered
      .withColumn("z", ZOrder.zValue(col("x"), col("y")))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.nonEmpty)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2,
        s"overlapping partition z-ranges: $hi1 > $lo2")
      case _ =>
    }
  }
}
