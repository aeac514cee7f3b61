package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import spark.implicits._
  import DataQuality._

  private val df = Seq(
    (1L, Some(10.0)), (2L, Some(20.0)), (2L, None), (3L, Some(-5.0))
  ).toDF("k", "v")

  test("suite evaluates all rules in one pass with correct verdicts") {
    val out = check(df, Seq(
      unique("k"),                       // fails: k=2 twice
      nullFraction("v", atMost = 0.3),   // passes: 1/4 = 0.25
      minAtLeast("v", 0.0)))             // fails: -5
    val res = out.collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(res("k_unique") == (3.0, false))
    assert(res("v_null_frac") == (0.25, true))
    assert(res("v_min") == (-5.0, false))
    assert(out.columns.toSeq == Seq("rule", "metric", "passed"))
  }

  test("duplicate rule names are rejected (they would collide in the agg)") {
    val e = intercept[IllegalArgumentException] {
      check(df, Seq(nullFraction("v", 0.3), nullFraction("v", 0.1)))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("single aggregation job for the whole suite (one Aggregate pair)") {
    val plan = check(df, Seq(unique("k"), minAtLeast("v", 0.0),
        maxAtMost("v", 100.0)))
      .queryExecution.executedPlan.toString
    // distinct agg plans Expand + two HashAggregate levels; adding more
    // rules must not add more scans
    assert(plan.split("LocalTableScan").length - 1 <= 1,
      s"suite re-scanned the input:\n$plan")
  }

  test("refIntegrity counts orphans") {
    val child = Seq((1L, "a"), (2L, "b"), (99L, "orphan")).toDF("fk", "x")
    val parent = Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L)).toDF("pk")
    val row = refIntegrity(child, "fk", parent, "pk").collect().head
    assert(row.getString(0) == "fk_in_pk")
    assert(row.getDouble(1) == 1.0 && !row.getBoolean(2))
    val clean = refIntegrity(child.filter(col("fk") < 10), "fk", parent, "pk")
      .collect().head
    assert(clean.getDouble(1) == 0.0 && clean.getBoolean(2))
  }
  test("suite over an empty frame: aggregates degrade, not crash") {
    val empty = Seq.empty[(Long, Option[Double])].toDF("k", "v")
    val res = check(empty, Seq(unique("k"), nullFraction("v", 0.5)))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getBoolean(2)))
      .toMap
    // 0 distinct == 0 rows → unique holds vacuously; avg over nothing
    // is null → the verdict fails CLOSED (null coalesced to false)
    assert(res("k_unique") == ((Some(0.0), true)))
    assert(res("v_null_frac") == ((None, false)))
  }

}
