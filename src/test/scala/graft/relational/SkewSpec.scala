package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of fact rows share one hot key
    val fact = (1 to 1000).map(i =>
      (if (i <= 900) 1L else (i % 50).toLong, s"row$i")).toDF("k", "payload")
    val dim = (0L to 50L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k"))
      .select("k", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8)
      .select("k", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(salted.size == 1000)
  }

  test("salt column does not leak into the result") {
    val fact = Seq((1L, "a")).toDF("k", "v")
    val dim = Seq((1L, "d")).toDF("k", "n")
    assert(Skew.saltedJoin(fact, dim, "k", salts = 4).columns.toSeq ==
      Seq("k", "v", "n"))
  }

  test("key histogram surfaces the heavy hitter") {
    val df = ((1 to 90).map(_ => 7L) ++ (11 to 20).map(_.toLong)).toDF("k")
    val top = Skew.keyHistogram(df, col("k"), topN = 1).collect().head
    assert(top.getLong(0) == 7L && top.getLong(1) == 90L)
  }
}
