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

  /** The word → token-array dictionary for every distinct corpus word.
    * ONE corpus scan collapses to the vocabulary-bounded (word, count)
    * frame (the [[train]] discipline); the merge table then derives
    * from pairs of DISTINCT words weighted by their occurrence counts
    * — arithmetically identical to [[mergeTable]]'s per-occurrence
    * count (Σ over occurrences ≡ Σ over distinct words × count), but
    * the pair explode runs over vocabulary rows, not corpus tokens.
    * The persisted frame is vocabulary-bounded at any corpus size;
    * the handle goes unreferenced once the dictionary materializes
    * and the ContextCleaner reclaims the blocks.
    */
  def dictionary(spark: SparkSession, docs: DataFrame, textCol: String,
      m: Int): DataFrame = {
    val vocab = docs.select(explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
      .persist()
    val table = vocab
      .filter(length(col("w")) > 1)
      .select(col("wn"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("wn")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(m)
      .collect()
      .zipWithIndex
      .map { case (r, i) => r.getString(0) -> (i + 1) }
      .toMap
    val bc = spark.sparkContext.broadcast(table)
    val enc = udf((w: String) => encodeWord(w, bc.value))
    vocab.select(col("w"), enc(col("w")).as("toks"))
  }

  /** Iterative BPE TRAINING (Sennrich et al. 2016 §3.2 shape): learn a
    * merge sequence by repeatedly (a) counting adjacent symbol pairs
    * over the word dictionary weighted by corpus word frequency,
    * (b) taking the argmax pair (count DESC, pair ASC — deterministic
    * tiebreak), (c) merging every left-to-right non-overlapping
    * occurrence of that pair in every word. This is the full trainer
    * the one-shot `mergeTable` statistic approximates.
    *
    * Distributed shape — the part that matters at 100 TB:
    *   - the corpus is scanned ONCE, collapsing to the (word, count)
    *     dictionary: the only frame the loop ever touches, orders of
    *     magnitude smaller than the corpus and bounded by vocabulary,
    *     not data volume;
    *   - each round is ONE small Spark job (explode slim pair rows →
    *     partial-agg count → TakeOrdered(1)); the driver collects
    *     exactly ONE row per round (the argmax) — the same bounded
    *     collect discipline as the k-means seeds in [[Similarity]];
    *   - the merge is applied as a native `replace` Column over the
    *     persisted base dictionary (chained T deep — codegen'd string
    *     ops, no UDF, no re-shuffle: the dictionary never moves).
    *
    * Symbol-sequence representation: the word's current segmentation
    * is the space-joined, space-framed symbol string (words are
    * whitespace-split so symbols can never contain the separator).
    * Merging pair "l r" is `replace(s, " l r ", " lr ")` — a SINGLE
    * left-to-right non-overlapping pass over the ORIGINAL string,
    * with identical semantics in `java.lang.String.replace` (local
    * layout), `UTF8String.replace` (distributed layout) and DuckDB's
    * `replace` (oracle). So " a a a " merges to " aa a " (the classic
    * overlap rule for same-symbol runs), and back-to-back DISTINCT
    * occurrences share their separator space, merging only the first
    * per round: " p a p a " → " pa p a ", with the second occurrence
    * picked up by the next round that elects "p a". This separator-
    * framed replace rule — not the symbol-array rule — is the
    * operator's defined merge semantics, applied byte-identically in
    * all three layouts (BpeSpec pins the reduplicated-word case).
    *
    * Returns the learned merge table: (step, pair, n) — pair counts at
    * the moment each merge was chosen, so every round's answer depends
    * on all previous merges having been applied correctly.
    *
    * DUAL LAYOUT (same pattern as connected components / PageRank):
    * the corpus always collapses to the dictionary distributively, but
    * when the dictionary fits the driver (≤ `localVocabThreshold`
    * rows, probed with a limit — never an unconditional count of an
    * unbounded frame) the T-round loop runs LOCALLY on the collected
    * (count, syms) array: T argmax rounds over a 10⁵-word dictionary
    * are microseconds of HashMap arithmetic, vs T scheduled Spark jobs
    * whose fixed overhead dominates at any fixture scale. Dictionaries
    * beyond the threshold run the identical loop distributively.
    * BpeSpec pins local ≡ distributed merge sequences.
    */
  def train(spark: SparkSession, docs: DataFrame, textCol: String,
      rounds: Int, localVocabThreshold: Int = 200000): DataFrame = {
    import spark.implicits._
    // Corpus → dictionary runs under the session's normal parallelism
    // (it's the one corpus-scale shuffle). The LOOP's per-round
    // aggregates are symbol-pair-bounded (tiny at any corpus size), so
    // they ride an isolated session with a small shuffle fan-in — T
    // rounds x 32 reduce tasks is pure scheduling overhead; the shared
    // session's conf is untouched. The persisted dictionary is shared:
    // the CacheManager is per-SparkContext, so the rebind hits the
    // same cached plan.
    val base = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .withColumn("s", concat(lit(" "), array_join(expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
        " "), lit(" ")))
      .persist()
    try {
      val probe = base.select(col("w")).limit(localVocabThreshold + 1)
        .count()
      val learned =
        if (probe <= localVocabThreshold)
          trainLocal(base.select(col("n"), col("s")).collect()
            .map(r => (r.getLong(0), r.getString(1))), rounds)
        else trainDistributed(spark, base, rounds)
      learned.toDF("step", "pair", "n")
    } finally { base.unpersist(); () }
  }

  /** UTF-8 byte-lexicographic order — matches Spark's UTF8String and
    * DuckDB's binary string comparison, unlike Java's UTF-16 compareTo
    * (they diverge on supplementary-plane characters).
    */
  private def ltUtf8(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** The fixture-scale loop: identical count/argmax/merge semantics on
    * the collected (count, framed-symbol-string) dictionary. The merge
    * step is the SAME single-pass framed-string replace as the
    * distributed layout and the oracle (`java.lang.String.replace` ≡
    * `UTF8String.replace` ≡ DuckDB `replace` on literal needles) — NOT
    * a symbol-array scan, which would diverge on back-to-back distinct
    * occurrences ("papa": array scan yields [pa,pa] in one round, the
    * string rule yields [pa,p,a] because the shared separator is
    * consumed by the first match).
    */
  private[llm] def trainLocal(dict: Array[(Long, String)],
      rounds: Int): Seq[(Int, String, Long)] = {
    var words = dict
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= rounds && !exhausted) {
      val counts = new java.util.HashMap[String, Long]()
      words.foreach { case (n, s) =>
        val a = s.trim.split(" ").filter(_.nonEmpty)
        var i = 0
        while (i < a.length - 1) {
          val k = a(i) + " " + a(i + 1)
          counts.put(k, counts.getOrDefault(k, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var bestPair: String = null
        var bestCnt = Long.MinValue
        counts.forEach { (p, c) =>
          if (c > bestCnt || (c == bestCnt && ltUtf8(p, bestPair))) {
            bestPair = p; bestCnt = c
          }
        }
        learned += ((step, bestPair, bestCnt))
        val target = " " + bestPair + " "
        val repl = " " + bestPair.replace(" ", "") + " "
        words = words.map { case (n, s) => (n, s.replace(target, repl)) }
        step += 1
      }
    }
    learned.toSeq
  }

  /** The at-scale loop: one slim-row count job + one-row argmax
    * collect per round; merges apply as chained codegen'd `replace`
    * columns over the persisted dictionary. Rides an isolated session
    * with a small shuffle fan-in (the per-round aggregate output is
    * symbol-pair-bounded regardless of corpus size).
    */
  private def trainDistributed(spark: SparkSession, base: DataFrame,
      rounds: Int): Seq[(Int, String, Long)] = {
    val iso = graft.core.Sessions.isolated(spark,
      Map("spark.sql.shuffle.partitions" -> "4"))
    val vocab0 = graft.core.Sessions.rebind(iso, base)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var seg: org.apache.spark.sql.Column = col("s")
    var step = 1
    var exhausted = false
    while (step <= rounds && !exhausted) {
      val best = vocab0
        .select(col("n"), split(trim(seg), " ").as("a"))
        .filter(size(col("a")) > 1)
        .select(col("n"), explode(expr(
          "transform(sequence(1, size(a) - 1), " +
            "i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))"))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        learned += ((step, pair, best(0).getLong(1)))
        seg = replace(seg, lit(s" $pair "),
          lit(" " + pair.replace(" ", "") + " "))
        step += 1
      }
    }
    learned.toSeq
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
