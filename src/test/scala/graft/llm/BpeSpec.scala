package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("encodeWord merges the lowest-ranked pair first, one step at a time") {
    // ranks: "ab" beats "bc" beats "cd"
    val rank = Map("ab" -> 1, "bc" -> 2, "cd" -> 3)
    // "abcd": ab merges first (pos 0) -> [ab, c, d]; "bc"/"cd" keys are
    // now unreachable ("ab"+"c" = "abc" is not in the table) except cd:
    // [ab, c, d] has pair c+d="cd" -> [ab, cd]
    assert(Bpe.encodeWord("abcd", rank) == Seq("ab", "cd"))
    // "bcd": bc first -> [bc, d]; "bc"+"d" not in table -> stop
    assert(Bpe.encodeWord("bcd", rank) == Seq("bc", "d"))
    // first occurrence wins among equal-rank candidates
    assert(Bpe.encodeWord("abab", Map("ab" -> 1)) == Seq("ab", "ab"))
    // no applicable merge -> characters
    assert(Bpe.encodeWord("xyz", rank) == Seq("x", "y", "z"))
    // shorter than 2 chars -> the word itself (including empty)
    assert(Bpe.encodeWord("a", rank) == Seq("a"))
    assert(Bpe.encodeWord("", rank) == Seq(""))
  }

  test("mergeTable ranks by count desc then pair asc") {
    val docs = Seq("aa ab aa", "ab aa zz").toDF("text")
    val table = Bpe.mergeTable(docs, "text", 3)
    // counts: aa=3, ab=2, zz=1 — ranks follow
    assert(table == Map("aa" -> 1, "ab" -> 2, "zz" -> 3), s"got $table")
  }

  test("encodeCorpus counts tokens and hashes the in-order stream") {
    val docs = Seq((1L, "abab xyz"), (2L, "xyz abab")).toDF("id", "text")
    val out = Bpe.encodeCorpus(docs, "id", "text", m = 2)
      .orderBy(col("id")).collect()
    // merge table from this corpus: pairs ab(4), ba(2), xy(2), yz(2)
    // -> top-2 = ab, ba; "abab" -> ab,ab ; "xyz" -> x,y,z
    assert(out.map(_.getLong(1)).toSeq == Seq(5L, 5L),
      s"token counts: ${out.map(_.getLong(1)).toSeq}")
    // same tokens, different word order -> different stream hashes
    assert(out(0).getString(2) != out(1).getString(2))
    // stream hash is reproducible
    val again = Bpe.encodeCorpus(docs, "id", "text", m = 2)
      .orderBy(col("id")).collect()
    assert(out.map(_.getString(2)).toSeq == again.map(_.getString(2)).toSeq)
  }

  test("dictionary covers every distinct corpus word exactly once") {
    val docs = Seq("the quick the fox", "fox jumps").toDF("text")
    val dict = Bpe.dictionary(spark, docs, "text", 10)
      .collect().map(r => r.getString(0)).toSeq
    assert(dict.sorted == dict.distinct.sorted)
    assert(dict.toSet == Set("the", "quick", "fox", "jumps"))
  }
}
