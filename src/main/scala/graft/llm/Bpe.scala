package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer APPLY: greedy merge-table encoding of a corpus — the
  * serving half of byte-pair encoding, complementing the
  * `bpe_pair_counts` training statistic. No reference counterpart
  * (north-star tokenizer surface).
  *
  * Semantics (deterministic, engine-replayable):
  *   - the MERGE TABLE is the top-m adjacent character pairs ranked by
  *     (occurrence count DESC, pair ASC) over whitespace-split corpus
  *     words — the same counting rule as `bpe_pair_counts`. One-shot
  *     static ranking: a full iterative BPE trainer is a driver loop of
  *     this same count job over re-encoded text, but a STATIC table
  *     keeps the operator a pure two-job dataflow, and the APPLY
  *     machinery (the part that serves at scale) is identical either
  *     way — it takes any (pair → rank) table as input.
  *   - ENCODING a word starts from its character sequence and
  *     repeatedly merges the FIRST occurrence of the LOWEST-RANKED
  *     adjacent symbol pair present in the table, until none remains.
  *     One occurrence per step (not all occurrences) keeps the spec
  *     free of overlap tie rules; the fixpoint is reached in < |word|
  *     steps regardless.
  *   - words shorter than 2 characters are a single token as-is.
  *
  * Scale shape: the merge table is a bounded driver collect (m rows) —
  * broadcast. Encoding runs ONCE PER DISTINCT WORD (the vocabulary
  * dictionary — orders of magnitude smaller than the corpus), and the
  * corpus token stream is produced by broadcast-joining the dictionary
  * onto slim (id, pos, word) rows: document text shuffles only as
  * exploded word tokens, the greedy loop never touches corpus-scale
  * rows, and per-doc reassembly is one hash aggregate keyed on the doc
  * id.
  */
object Bpe {

  /** (pair → 1-based rank) for the top-m character pairs. Bounded
    * collect: m rows.
    */
  def mergeTable(docs: DataFrame, textCol: String, m: Int): Map[String, Int] =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 1)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(m)
      .collect()
      .zipWithIndex
      .map { case (r, i) => r.getString(0) -> (i + 1) }
      .toMap

  /** Pure greedy encode of one word — shared by the executor UDF and
    * specs so both run the identical loop.
    */
  def encodeWord(word: String, rank: Map[String, Int]): Seq[String] = {
    if (word.length < 2) return Seq(word)
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i < syms.length - 1) {
        rank.get(syms(i) + syms(i + 1)) match {
          case Some(r) if r < bestRank => bestRank = r; bestPos = i
          case _ =>
        }
        i += 1
      }
      if (bestPos < 0) done = true
      else syms = (syms.take(bestPos) :+
        (syms(bestPos) + syms(bestPos + 1))) ++ syms.drop(bestPos + 2)
    }
    syms
  }

  /** The word → token-array dictionary for every distinct corpus word. */
  def dictionary(spark: SparkSession, docs: DataFrame, textCol: String,
      m: Int): DataFrame = {
    val table = mergeTable(docs, textCol, m)
    val bc = spark.sparkContext.broadcast(table)
    val enc = udf((w: String) => encodeWord(w, bc.value))
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .distinct()
      .select(col("w"), enc(col("w")).as("toks"))
  }

  /** Per-document encoding summary: total BPE token count and the md5
    * of the full space-joined token stream in word order — a sequence-
    * level signature, so a wrong merge order in ANY word of the doc
    * changes the output.
    */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
      m: Int): DataFrame = {
    val dict = dictionary(docs.sparkSession, docs, textCol, m)
    val words = docs.select(col(idCol).as("id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
    words.join(broadcast(dict), Seq("w"))
      .groupBy(col("id"))
      .agg(
        sum(size(col("toks"))).as("n_tokens"),
        md5(array_join(flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("toks")))),
          x => x.getField("toks"))), " ")).as("tok_md5"))
  }
}
