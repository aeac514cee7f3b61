package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The probabilistic half of the count-min contract, kept OUT of the
  * hashed agg_countmin oracle: est ≤ exact + ε·total holds per estimate
  * only with probability 1−δ (δ=0.001 here), so over 20 hashed rows a
  * gate assertion would flake ~2% of runs. Here a miss is a diagnosable
  * test failure with the offending user printed — and with the fixed
  * seed the fixture outcome is deterministic anyway.
  */
class CountMinBoundSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("CMS estimates stay within est <= exact + eps*total (seeded)") {
    val ev = Tables.events(spark, sfDir)
    val eps = 0.01
    val skBytes = ev
      .agg(expr("count_min_sketch(user_id, 0.01d, 0.999d, 42)").as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val total = ev.count()
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(skBytes))
    val slack = math.ceil(eps * total).toLong
    val exact = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("user_id"))
      .limit(20)
      .collect()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      val (u, n) = (r.getLong(0), r.getLong(1))
      val e = cms.estimateCount(u)
      assert(e >= n, s"CMS undercounted user $u: est=$e exact=$n")
      assert(e <= n + slack,
        s"CMS overcount beyond eps bound for user $u: est=$e exact=$n slack=$slack")
    }
  }
}
