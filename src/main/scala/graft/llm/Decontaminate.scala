package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share word
  * n-grams with an evaluation/benchmark set — the standard hygiene pass
  * before LLM training (a training doc containing a benchmark item
  * inflates eval scores). The reference has no analogue; this is part
  * of the LLM-pipeline surface the engine adds on top of it.
  *
  * Scale shape: the benchmark side is always tiny relative to the
  * corpus (benchmark suites are megabytes; the corpus is the 100 TB
  * side), so its distinct n-gram hash set BROADCASTS and the corpus
  * side never shuffles raw text — each document reduces to slim
  * (id, 8-byte hash) rows that left-join the broadcast set map-side,
  * then ONE partial-aggregated groupBy yields per-doc totals. Join and
  * count on 64-bit FNV hashes, never n-gram strings: a hash collision
  * can only inflate an overlap count by ~2⁻⁶⁴·|set| — immaterial — and
  * the shuffle payload stays 16 B/row regardless of document size
  * (same argument as [[Dedup.hashedShingles]], which supplies the
  * hashing).
  */
object Decontaminate {

  /** Slim (id, sig) rows: one row per DISTINCT word k-shingle hash per
    * document ([[Dedup.hashedShingles]] dedups per doc, so downstream
    * counts are distinct-counts without a distinct shuffle).
    */
  def shingleSet(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(Dedup.hashedShingles(col(textCol), k)).as("sig"))

  /** Per-document contamination report against a benchmark set:
    * `n_ngrams` distinct k-gram hashes in the doc, `n_overlap` of them
    * shared with ANY benchmark doc, `overlap_frac` their ratio. Only
    * contaminated docs (n_overlap > 0) are returned — at corpus scale
    * the clean rows are the overwhelming majority and carry no signal.
    *
    * `broadcastBench = false` falls back to a shuffle join for the
    * rare giant-benchmark case; correctness is identical.
    */
  def contaminationReport(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, k: Int = 5,
      broadcastBench: Boolean = true): DataFrame = {
    val bg = shingleSet(bench, idCol, textCol, k)
      .select(col("sig")).distinct()
      .withColumn("hit", lit(1))
    val bgSide = if (broadcastBench) broadcast(bg) else bg
    shingleSet(corpus, idCol, textCol, k)
      .join(bgSide, Seq("sig"), "left_outer")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_ngrams"), count(col("hit")).as("n_overlap"))
      .filter(col("n_overlap") > 0)
      .select(col("id"), col("n_overlap"), col("n_ngrams"),
        round(col("n_overlap") / col("n_ngrams"), 6).as("overlap_frac"))
  }

  /** Contamination report via a BLOOM pre-filter — the shape for when
    * the benchmark side is too big to broadcast as an exact hash set.
    * A suite of eval benchmarks can reach 10⁹ distinct n-grams
    * (~16 GB exact); at 1.2 bytes/key (fpp 0.01) the Bloom sketch is
    * ~1.2 GB and broadcasts where the set cannot. Three-phase:
    *
    *   1. build the sketch over the bench sigs (one distributed
    *      treeAggregate on the SMALL side,
    *      [[graft.relational.RuntimeFilter.bloomSemiFilter]]);
    *   2. map-side prune the corpus shingle stream against the
    *      broadcast sketch — at corpus scale the overwhelming
    *      majority of shingles drop HERE, before any shuffle;
    *   3. exact-verify the survivors with a semi join against the real
    *      bench sig set. Only bloom survivors (true overlaps + the
    *      fpp·n false positives) enter this join, so it is tiny even
    *      as a shuffle join when the bench set stays unbroadcastable.
    *
    * No false negatives exist at any phase, and phase 3 removes the
    * false positives, so the report is BYTE-IDENTICAL to
    * [[contaminationReport]] — which is why it shares that oracle.
    * Per-doc totals (`n_ngrams`) come from a separate partial-agg pass
    * over the unpruned shingle stream (they must count clean shingles
    * too); its shuffle rows are (id, count) partials, not shingles.
    */
  def contaminationReportBloom(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, k: Int = 5,
      fpp: Double = 0.01): DataFrame = {
    // n_ngrams rides the exploded rows as size(sh) — hashedShingles is
    // already distinct per doc, so the per-doc total IS the array size,
    // and every contaminated doc keeps ≥1 survivor row carrying it.
    // That folds the old separate totals pass (a second corpus
    // scan+shingling) and its re-join into the one survivor aggregate.
    // The shingle array is staged as an attribute in its own projection
    // so the generate keeps it a per-input-row value (the
    // inline-payload-next-to-explode trap only bites expressions).
    val cg = corpus
      .select(col(idCol).as("id"),
        Dedup.hashedShingles(col(textCol), k).as("sh"))
      .select(col("id"), size(col("sh")).cast("long").as("n_ngrams"),
        explode(col("sh")).as("sig"))
    val bg = shingleSet(bench, idCol, textCol, k)
      .select(col("sig")).distinct()
      .persist()
    try {
      // the bench side is the small side by definition — an exact
      // count is one cheap job and sizes the sketch correctly
      val nBench = math.max(1L, bg.count())
      val survivors = graft.relational.RuntimeFilter
        .bloomSemiFilter(cg, "sig", bg, "sig", nBench, fpp)
        .join(bg, Seq("sig"), "left_semi")
      survivors.groupBy(col("id"))
        .agg(count(lit(1)).as("n_overlap"),
          first(col("n_ngrams")).as("n_ngrams"))
        .select(col("id"), col("n_overlap"), col("n_ngrams"),
          round(col("n_overlap") / col("n_ngrams"), 6).as("overlap_frac"))
    } finally { bg.unpersist(): Unit }
  }

  /** The decontaminated corpus: drop documents whose contamination
    * fraction reaches `maxFrac` (0.0 drops on ANY shared n-gram). An
    * anti join against the (small) contaminated-id list, so the
    * surviving corpus rows never shuffle.
    */
  def decontaminated(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, k: Int = 5,
      maxFrac: Double = 0.0): DataFrame = {
    val bad = contaminationReport(corpus, bench, idCol, textCol, k)
      .filter(col("overlap_frac") > maxFrac)
      .select(col("id"))
    corpus.join(broadcast(bad), corpus(idCol) === bad("id"), "left_anti")
  }
}
