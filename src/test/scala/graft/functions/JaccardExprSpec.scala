package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Dedup

class JaccardExprSpec extends SparkSpec {
  import spark.implicits._

  test("matches the array_intersect/union jaccard on hashed shingles") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog in the park"),
      (2L, "the quick brown fox jumps over the sleepy dog in the park"),
      (3L, "completely different words about database engines and queries"))
    val df = texts.toDF("id", "t")
      .select(col("id"), Dedup.hashedShingles(col("t")).as("sh"))
    val pairs = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(
        GraftFunctions.jaccardSorted(col("a.sh"), col("b.sh")).as("native"),
        Dedup.jaccard(col("a.sh"), col("b.sh")).as("builtin"))
      .collect()
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
        s"native ${r.getDouble(0)} != builtin ${r.getDouble(1)}")
    }
  }

  test("edge cases: identical=1, disjoint=0, both empty=0, null=null") {
    val df = Seq(
      (Some(Seq(1L, 2L, 3L)), Some(Seq(1L, 2L, 3L))),
      (Some(Seq(1L, 2L)), Some(Seq(3L, 4L))),
      (Some(Seq.empty[Long]), Some(Seq.empty[Long])),
      (None, Some(Seq(1L)))
    ).toDF("a", "b")
    val out = df.select(GraftFunctions.jaccardSorted(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 1.0)
    assert(out(1).getDouble(0) == 0.0)
    assert(out(2).getDouble(0) == 0.0)
    assert(out(3).isNullAt(0))
  }

  test("callable from SQL via the extension registry") {
    val (ident, info, builder) = GraftFunctions.jaccardSortedDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    val r = spark.sql(
      "SELECT graft_jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L))")
      .collect().head.getDouble(0)
    assert(math.abs(r - 0.5) < 1e-12) // |∩|=2, |∪|=4
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(50).select(
      sort_array(array(col("id"), col("id") + 2)).as("a"),
      sort_array(array(col("id") + 1, col("id") + 2)).as("b"))
      .select(GraftFunctions.jaccardSorted(col("a"), col("b")).as("j"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_jaccard_sorted"), plan.take(300))
    val vals = df.collect().map(_.getDouble(0))
    assert(vals.forall(v => math.abs(v - 1.0 / 3.0) < 1e-12)) // share {id+2}
  }
}
