package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized equivalence: the native merge-pass Jaccard must agree
  * exactly with the builtin `array_intersect`/`array_union` composition
  * on arbitrary sorted distinct arrays (including empty and disjoint).
  */
class JaccardPropertySpec extends SparkSpec {
  import spark.implicits._

  test("native jaccard == builtin composition on 300 random sorted sets") {
    val rnd = new scala.util.Random(7)
    def randomSet(): Seq[Long] = {
      val n = rnd.nextInt(50)
      Seq.fill(n)(rnd.nextInt(80).toLong).distinct.sorted
    }
    val pairs = (1 to 300).map(i => (i.toLong, randomSet(), randomSet()))
    val df = pairs.toDF("id", "a", "b")
    val mismatches = df.select(
        col("id"),
        GraftFunctions.jaccardSorted(col("a"), col("b")).as("native"),
        (size(array_intersect(col("a"), col("b"))).cast("double") /
          greatest(size(array_union(col("a"), col("b"))), lit(1))
            .cast("double")).as("builtin"))
      .filter(col("native") =!= col("builtin"))
      .collect()
    assert(mismatches.isEmpty,
      s"native/builtin disagree: ${mismatches.take(5).mkString(", ")}")
  }

  test("simhash is token-order invariant and self-distance 0") {
    val rnd = new scala.util.Random(11)
    val docs = (1 to 50).map { i =>
      val words = Seq.fill(3 + rnd.nextInt(40))(s"w${rnd.nextInt(30)}")
      (i.toLong, words.mkString(" "), rnd.shuffle(words).mkString(" "))
    }
    val sigs = docs.toDF("id", "t1", "t2").select(
        graft.llm.Dedup.simhashCol(col("t1")).as("s1"),
        graft.llm.Dedup.simhashCol(col("t2")).as("s2"))
      .collect()
    sigs.foreach(r => assert(r.getLong(0) == r.getLong(1),
      "shuffled token order must not change the simhash"))
  }
}
