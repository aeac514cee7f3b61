package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step that turns a cleaned document corpus
  * into fixed-length training examples: concatenate documents in a
  * deterministic order and cut the global token stream every
  * `chunkLen` tokens (documents span chunk boundaries; no padding
  * waste). The hard part at scale is the GLOBAL PREFIX SUM of token
  * counts: a bare `Window.orderBy(id)` with no partition key plans a
  * single-partition window — one task scans the whole corpus. This
  * module runs the classic two-phase distributed scan instead:
  * per-bucket local cumulative sums in parallel, plus a
  * one-row-per-bucket offset frame cumulated alone and broadcast
  * back. Nothing global ever exceeds #buckets rows.
  */
object SeqPack {

  /** Adds `start` = exclusive global prefix sum of `nCol` in `idCol`
    * order. `bucketCol` must be a deterministic, order-aligned
    * coarsening of `idCol` (b1 < b2 ⇒ every id in b1 sorts before
    * every id in b2) — e.g. `id div 1000` for dense ids, or a
    * range-partition id. The per-bucket window runs fully parallel;
    * only the #buckets-row offset frame is cumulated on one task,
    * which is bounded by construction (buckets ~ corpus/10⁶ rows).
    */
  def withStartOffsets(df: DataFrame, idCol: String, nCol: String,
      bucketCol: Column): DataFrame = {
    val b = df.withColumn("_bucket", bucketCol)
    val local = b.withColumn("_local_start",
      coalesce(sum(col(nCol)).over(
        Window.partitionBy(col("_bucket")).orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // the offset frame is ≤ #buckets rows BY CONSTRUCTION, so one
    // partition is the point, not a hazard — the constant partition
    // key states that intent and keeps WindowExec's all-data-to-one-
    // partition warning out of scale logs, where it would read as the
    // exact failure this module exists to avoid. It must be
    // NON-FOLDABLE (the optimizer's EliminateWindowPartitions strips
    // foldable partition keys and the warning returns) and NULL-ROBUST
    // (col × 0 is NULL on a null input, silently splitting null-keyed
    // rows into a second partition): pmod(hash(col), 1) is both —
    // hash never returns null, pmod(_, 1) is always 0
    val offsets = b.groupBy(col("_bucket"))
      .agg(sum(col(nCol)).as("_total"))
      .withColumn("_bucket_offset",
        coalesce(sum(col("_total")).over(
          Window.partitionBy(pmod(hash(col("_bucket")), lit(1)))
            .orderBy(col("_bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_bucket"), col("_bucket_offset"))
    local.join(broadcast(offsets), Seq("_bucket"))
      .withColumn("start",
        (col("_local_start") + col("_bucket_offset")).cast("long"))
      .drop("_bucket", "_local_start")
  }

  /** Per-chunk packing report: each document lands in chunks
    * `start div L .. (start+n-1) div L`, contributing the overlap of
    * its token interval with the chunk's. Returns (chunk, n_docs,
    * n_tokens) — every chunk except the last carries exactly
    * `chunkLen` tokens, the invariant a packed training set must
    * satisfy. Zero-token rows are dropped (they occupy no stream
    * positions). Pure integer arithmetic end to end, so an external
    * oracle replays it exactly.
    */
  def packChunks(df: DataFrame, idCol: String, nCol: String,
      bucketCol: Column, chunkLen: Long): DataFrame = {
    require(chunkLen > 0, s"chunkLen must be > 0, got $chunkLen")
    val L = lit(chunkLen)
    withStartOffsets(df, idCol, nCol, bucketCol)
      .filter(col(nCol) > 0)
      .withColumn("_end", col("start") + col(nCol))
      .withColumn("chunk", explode(sequence(
        floor(col("start") / L).cast("long"),
        floor((col("_end") - 1) / L).cast("long"))))
      .withColumn("_contrib",
        least(col("_end"), (col("chunk") + 1) * L) -
          greatest(col("start"), col("chunk") * L))
      .groupBy(col("chunk"))
      .agg(count(lit(1)).cast("int").as("n_docs"),
        sum(col("_contrib")).cast("long").as("n_tokens"))
  }

  /** PADDING-WASTE REPORT for length-bucketed batching — the
    * training-efficiency twin of [[packChunks]]: when examples must
    * stay document-aligned (no cross-document packing — SFT,
    * preference pairs, eval suites), a batch pads every sequence to
    * its longest member, and batching in ARRIVAL order pays for the
    * length variance inside every batch. Sorting by length first
    * makes batches length-homogeneous, collapsing the waste — this
    * operator quantifies both strategies on the real corpus:
    * per strategy, rows are ranked (by id = arrival, by (n, id) =
    * length-sorted), cut into batches of `batchSize`, and each batch
    * pays `batchSize·max(n) − sum(n)` padding (the final short batch
    * pads to its own max over its actual rows).
    *
    * Scale shape: the two global ranks run as the same two-phase
    * scan as [[withStartOffsets]] — value-range buckets (id ranges
    * for arrival order, length ranges for length-sorted order; both
    * order-aligned by construction) carry fully-parallel per-bucket
    * `row_number`s, and only the ≤2048-row bucket-count frame is
    * cumulated on one task. `idCol` must be numeric and unique; the
    * per-batch aggregate is one shuffle on batch id. Pure integer
    * arithmetic ⇒ externally replayable.
    */
  def paddingReport(df: DataFrame, idCol: String, nCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    // the ranks bucket on (id − lo)/span integer arithmetic, so the id
    // must actually BE numeric — a string id would cast("long") to
    // null silently, turning "arrival order" into nondeterministic
    // garbage ranks instead of an error
    val idType = df.schema(idCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(idType),
      s"paddingReport needs an integral id column for arrival-order " +
        s"ranking; '$idCol' is $idType")
    // persisted: FIVE consumers read these slim (id, n) rows — the
    // bounds probe plus two per strategy (twoPhaseRank's local-rank
    // window and its bucket-count aggregate) — and unpersisted each
    // re-runs the caller's upstream (typically a corpus tokenize).
    // Two longs per document, so the cache is corpus-row-bounded and
    // spillable; the handle goes unreferenced once the report frame
    // is materialized and the ContextCleaner reclaims the blocks.
    val base = df.select(col(idCol).cast("long").as("id"),
        col(nCol).cast("long").as("n"))
      .filter(col("n") > 0)
      .persist()
    // one tiny driver-side row: value bounds -> ~2048 order-aligned
    // bucket spans (rows with equal n share a bucket, so the (n, id)
    // tie-break never crosses a bucket boundary); doubles as the
    // cache-materializing action
    val bounds = base.agg(
      min(col("id")), max(col("id")), min(col("n")), max(col("n"))).head()
    def span(lo: Int, hi: Int): Long =
      if (bounds.isNullAt(lo)) 1L
      else 1L.max((bounds.getLong(hi) - bounds.getLong(lo)) / 2048L + 1L)
    val (idLo, idSpan) = (if (bounds.isNullAt(0)) 0L else bounds.getLong(0),
      span(0, 1))
    val (nLo, nSpan) = (if (bounds.isNullAt(2)) 0L else bounds.getLong(2),
      span(2, 3))
    def strat(name: String, bucket: Column, order: Seq[Column]): DataFrame =
      twoPhaseRank(base, bucket, order)
        .withColumn("batch", ((col("rk") - 1) / batchSize).cast("long"))
        .groupBy(col("batch"))
        .agg(count(lit(1)).as("rows"), max(col("n")).as("mx"),
          sum(col("n")).as("tok"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("tok")).as("real_tokens"),
          sum(col("rows") * col("mx") - col("tok")).as("padding_tokens"))
        .select(lit(name).as("strategy"), col("n_batches"),
          col("real_tokens"), col("padding_tokens"),
          round(col("padding_tokens").cast("double") /
            (col("real_tokens") + col("padding_tokens")).cast("double"),
            6).as("waste_frac"))
    strat("arrival", (col("id") - idLo) / idSpan, Seq(col("id")))
      .unionByName(strat("length_sorted", (col("n") - nLo) / nSpan,
        Seq(col("n"), col("id"))))
  }

  /** Exclusive-prefix-count flavor of [[withStartOffsets]]: adds
    * `rk` = 1-based global `row_number` in `order`, computed as a
    * per-bucket local rank plus a broadcast bucket-count offset.
    * `bucket` must be an order-aligned coarsening of `order` (b1 <
    * b2 ⇒ every row in b1 sorts before every row in b2); only the
    * #buckets-row offset frame is cumulated on a single task.
    */
  private def twoPhaseRank(df: DataFrame, bucket: Column,
      order: Seq[Column]): DataFrame = {
    val b = df.withColumn("_rbucket", floor(bucket).cast("long"))
    val local = b.withColumn("_lrk", row_number().over(
      Window.partitionBy(col("_rbucket")).orderBy(order: _*)).cast("long"))
    // bounded offset frame: non-foldable null-robust constant key,
    // same rationale as withStartOffsets
    val offsets = b.groupBy(col("_rbucket"))
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_roff",
        coalesce(sum(col("_cnt")).over(
          Window.partitionBy(pmod(hash(col("_rbucket")), lit(1)))
            .orderBy(col("_rbucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_rbucket"), col("_roff"))
    local.join(broadcast(offsets), Seq("_rbucket"))
      .withColumn("rk", col("_roff") + col("_lrk"))
      .drop("_rbucket", "_lrk")
  }
}
