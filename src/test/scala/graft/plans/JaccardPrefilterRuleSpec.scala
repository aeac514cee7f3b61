package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions

class JaccardPrefilterRuleSpec extends SparkSpec {
  import spark.implicits._

  private def pairs = Seq(
    // identical sets: J = 1.0 — must survive the prefilter
    (1L, Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 4L)),
    // wildly mismatched sizes: J < 0.7 AND prefilter-rejectable
    (2L, Seq(1L, 2L), Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)),
    // same size, disjoint: prefilter passes, merge pass rejects
    (3L, Seq(1L, 2L, 3L), Seq(7L, 8L, 9L)),
    // 3-of-4 overlap: J = 3/5 = 0.6 < 0.7
    (4L, Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 9L)))
    .toDF("id", "a", "b")

  // a parquet-backed frame: ConvertToLocalRelation would constant-fold
  // a filter over a LocalRelation at optimization time (the semantics
  // tests cover that path), hiding the plan shape under test
  private lazy val pairsOnDisk = {
    val dir = java.nio.file.Files.createTempDirectory("jp_pairs").toString
    pairs.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("rule conjoins two size prefilters onto a jaccard threshold filter") {
    val q = pairsOnDisk
      .filter(GraftFunctions.jaccardSorted(col("a"), col("b")) >= lit(0.7))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_jaccard_sorted"), optimized)
    // two conjuncts × two size() calls each; exactly once (idempotent)
    val sizeCount = "size\\(".r.findAllIn(optimized).length
    assert(sizeCount == 4,
      s"expected the 2 size-prefilter conjuncts exactly once, got $sizeCount size() calls:\n$optimized")
  }

  test("rewrite preserves semantics on planted pass/reject cases") {
    val got = pairs
      .filter(GraftFunctions.jaccardSorted(col("a"), col("b")) >= lit(0.7))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L), s"only the identical pair passes at 0.7: $got")
    // threshold low enough that the 0.6-overlap pair must pass: proves the
    // prefilter never over-prunes near-threshold pairs
    val loose = pairs
      .filter(GraftFunctions.jaccardSorted(col("a"), col("b")) >= lit(0.5))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(loose == Set(1L, 4L), s"$loose")
  }

  test("SQL text form and reversed literal order both get the prefilter") {
    pairsOnDisk.createOrReplaceTempView("jp_pairs")
    val sqlQ = spark.sql(
      "SELECT id FROM jp_pairs WHERE graft_jaccard_sorted(a, b) >= 0.7")
    assert("size\\(".r.findAllIn(sqlQ.queryExecution.optimizedPlan.toString).length == 4)
    val reversed = spark.sql(
      "SELECT id FROM jp_pairs WHERE 0.7D <= graft_jaccard_sorted(a, b)")
    assert("size\\(".r.findAllIn(reversed.queryExecution.optimizedPlan.toString).length == 4,
      reversed.queryExecution.optimizedPlan.toString)
    assert(sqlQ.collect().map(_.getLong(0)).toSet == Set(1L))
    assert(reversed.collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("null arrays flow identically through prefilter and jaccard") {
    val withNull = Seq(
      (1L, Some(Seq(1L, 2L)), Some(Seq(1L, 2L))),
      (2L, None, Some(Seq(1L, 2L))))
      .toDF("id", "a", "b")
    val got = withNull
      .filter(GraftFunctions.jaccardSorted(col("a"), col("b")) >= lit(0.5))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L)) // null row filtered, not errored
  }
}
