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

  test("train learns merges by weighted count with deterministic tiebreak") {
    // corpus: "aaab" x2, "ab" x1. Round 1 pairs (weighted):
    //   a a: 2 words x 2 occurrences... "aaab" chars a,a,a,b -> pairs
    //   (a,a) x2, (a,b) x1 per word; "ab" -> (a,b) x1.
    //   counts: "a a" = 4, "a b" = 3 -> merge "a a" (count 4).
    // apply to "aaab" = " a a a b ": left-to-right non-overlap ->
    //   " aa a b " (the classic overlap rule).
    // Round 2 pairs: "aaab"-> (aa,a) x2? no: syms [aa, a, b] -> (aa,a),
    //   (a,b), each x2 docs; "ab" -> (a,b) x1.
    //   counts: "a b" = 3, "aa a" = 2 -> merge "a b" (count 3).
    // Round 3: "aaab" syms [aa, ab] -> (aa,ab) x2; "ab" single sym.
    //   merge "aa ab" count 2.
    // Round 4: all words single-symbol -> loop exhausts early.
    val docs = Seq("aaab aaab ab").toDF("text")
    val out = Bpe.train(spark, docs, "text", rounds = 8)
      .orderBy(col("step")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1, "a a", 4L), (2, "a b", 3L), (3, "aa ab", 2L)),
      s"got $out")
  }

  test("train local and distributed layouts learn identical merges") {
    val docs = Seq("peer peer speed speedy", "deed speed dyad peer")
      .toDF("text")
    val local = Bpe.train(spark, docs, "text", rounds = 6)
      .orderBy(col("step")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // threshold 0 forces the keyed distributed loop on the same corpus
    val dist = Bpe.train(spark, docs, "text", rounds = 6,
        localVocabThreshold = 0)
      .orderBy(col("step")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(local.nonEmpty && local == dist,
      s"local $local vs distributed $dist")
  }

  test("train merges reduplicated words via the framed-string rule in " +
      "both layouts") {
    // "papa": round 1 elects "p a" (count 2). The single-pass framed
    // replace on " p a p a " consumes the shared separator: only the
    // FIRST occurrence merges -> " pa p a " (NOT [pa, pa] — that's the
    // symbol-array rule the oracle does not implement). Round 2 pairs
    // over [pa, p, a]: "pa p"=1, "p a"=1 -> byte-order tiebreak picks
    // "p a" (' ' < 'a') -> " pa pa ". Round 3 merges "pa pa" -> done.
    val docs = Seq("papa").toDF("text")
    val expect = Seq((1, "p a", 2L), (2, "p a", 1L), (3, "pa pa", 1L))
    val local = Bpe.train(spark, docs, "text", rounds = 6)
      .orderBy(col("step")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(local == expect, s"local layout got $local")
    val dist = Bpe.train(spark, docs, "text", rounds = 6,
        localVocabThreshold = 0)
      .orderBy(col("step")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(dist == expect, s"distributed layout got $dist")
  }

  test("train tiebreak is pair-ascending at equal counts") {
    // "xy" and "ab" both occur twice; "a b" < "x y" lexicographically
    val docs = Seq("xy ab", "ab xy").toDF("text")
    val out = Bpe.train(spark, docs, "text", rounds = 1).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(("a b", 2L)), s"got $out")
  }

  test("dictionary covers every distinct corpus word exactly once") {
    val docs = Seq("the quick the fox", "fox jumps").toDF("text")
    val dict = Bpe.dictionary(spark, docs, "text", 10)
      .collect().map(r => r.getString(0)).toSeq
    assert(dict.sorted == dict.distinct.sorted)
    assert(dict.toSet == Set("the", "quick", "fox", "jumps"))
  }
}
