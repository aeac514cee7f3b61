package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing: pre-shuffled table layout so equi-joins on the bucket
  * key plan with NO Exchange — the co-located-join strategy for
  * repeatedly-joined 100 TB fact tables (SURVEY §2.2 joins row).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans without a shuffle") {
    // default spark-warehouse/ under cwd (gitignored); warehouse.dir is
    // a static conf and cannot be set on a live session
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_bucketed_left")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_bucketed_right")
    // force the shuffle-join planner path (broadcast would win on this
    // tiny fixture and hide the bucketing effect)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bucketed_left")
        .join(spark.table("graft_bucketed_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(600)}")
      assert(plan.contains("Bucketed: true"), plan.take(600))
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_left")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_right")
    }
  }

  test("unbucketed same join needs an Exchange (the baseline)") {
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
      .repartition(8)
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
      .repartition(7)
    // disable broadcast so the comparison is shuffle-join vs bucketed
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = left.join(right, "k").queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
