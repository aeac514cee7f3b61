package graft.relational

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the AQE skew-join mitigation: on a deliberately skewed key,
  * [[Skew.aqeSkewJoin]] must (a) produce exactly the plain join's rows
  * and (b) actually SPLIT the hot reducer partition — the executed
  * plan carries a skew-marked sort-merge join whose shuffle read
  * expands the skewed partition into multiple partial-reducer slices.
  */
class JoinSkewAqeSpec extends SparkSpec {
  import spark.implicits._

  // ~50k rows, 90% on key 0 — one hot reducer partition
  private def fact = (0 until 50000).map { i =>
    (if (i < 45000) 0L else (i % 10).toLong, i.toLong)
  }.toDF("sk", "v")
  private def dim = (0L until 10L).map(k => (k, s"label_$k")).toDF("sk", "name")

  private def collectPlans(p: SparkPlan): Seq[SparkPlan] =
    walkExecutedPlan(p)

  test("skewed partition is split and the result equals the plain join") {
    val joined = Skew.aqeSkewJoin(fact, dim, "sk",
      skewThresholdBytes = 16L << 10, advisoryBytes = 8L << 10)
      .groupBy(col("sk"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val got = joined.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)

    val plain = fact.join(dim, Seq("sk"))
      .groupBy(col("sk"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == plain.toSeq, "skew split changed the result")

    val plans = collectPlans(joined.queryExecution.executedPlan)
    val smj = plans.collect { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"no sort-merge join in:\n${plans.mkString("\n")}")
    assert(smj.exists(_.isSkewJoin),
      s"no skew-marked SMJ — AQE did not split:\n${smj.mkString("\n")}")
    // the skewed side's shuffle read expanded the hot partition into
    // multiple slices: more output partitions than any single reducer
    // would have, visible as partial-reducer specs in the read
    val reads = plans.collect { case r: AQEShuffleReadExec => r }
    assert(reads.exists(_.partitionSpecs.exists(_.getClass.getSimpleName
        .contains("PartialReducerPartitionSpec"))),
      s"no partial-reducer slices in shuffle reads:\n${reads.mkString("\n")}")
  }

  test("unskewed data passes through without skew marking") {
    val even = (0 until 5000).map(i => ((i % 10).toLong, i.toLong))
      .toDF("sk", "v")
    val joined = Skew.aqeSkewJoin(even, dim, "sk",
      skewThresholdBytes = 1L << 30, advisoryBytes = 1L << 29)
    joined.collect()
    val smj = collectPlans(joined.queryExecution.executedPlan)
      .collect { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty && !smj.exists(_.isSkewJoin))
  }
}
