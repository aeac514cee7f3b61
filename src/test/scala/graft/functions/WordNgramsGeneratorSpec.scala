package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WordNgramsGeneratorSpec extends SparkSpec {
  import spark.implicits._

  private def toks = Seq(
    (1L, Seq("a", "b", "c", "d")),
    (2L, Seq("x", "y")), // shorter than n=3 → one whole-text ngram
    (3L, Seq.empty[String]),
    (4L, null)).toDF("id", "toks")

  test("emits one (pos, ngram) row per window; short rows degrade") {
    val rows = toks
      .select(col("id"),
        GraftFunctions.ngrams(col("toks"), 3).as(Seq("pos", "ngram")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(rows == Set(
      (1L, 0, "a b c"), (1L, 1, "b c d"),
      (2L, 0, "x y")))
  }

  test("agrees with the composable transform+posexplode form") {
    val composable = toks.filter(col("toks").isNotNull &&
        size(col("toks")) > 0)
      .select(col("id"), posexplode(expr(
        """CASE WHEN size(toks) < 3 THEN array(array_join(toks, ' '))
           ELSE transform(sequence(0, size(toks) - 3),
             i -> array_join(slice(toks, i + 1, 3), ' ')) END"""))
        .as(Seq("pos", "ngram")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val native = toks
      .select(col("id"),
        GraftFunctions.ngrams(col("toks"), 3).as(Seq("pos", "ngram")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(native == composable)
  }

  test("callable from SQL as a LATERAL VIEW generator") {
    toks.createOrReplaceTempView("ngram_demo")
    val out = spark.sql("""
      SELECT id, pos, ngram FROM ngram_demo
      LATERAL VIEW graft_ngrams(toks, 2) g AS pos, ngram
      WHERE id = 1 ORDER BY pos""").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("a b", "b c", "c d"))
  }
}
