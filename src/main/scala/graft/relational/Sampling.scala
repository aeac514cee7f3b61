package graft.relational

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.storage.StorageLevel

/** L-2..L-5 and C-1..C-3: sampling, partition-sizing, micro-batching,
  * persistence-level helpers.
  *
  * Thin by design — each maps to one Spark builtin — but with the two
  * policies the reference leaves implicit made explicit:
  *   - every random op takes a SEED (the reference's `randomSplit`/
  *     `sample` are unseeded, `Trainer.scala:170-172`, so its runs are
  *     unreproducible — SURVEY §7.4 item 2);
  *   - the partition-size heuristic (≈10k rows/partition, min 2,
  *     reference `Trainer.scala:172`) is a named function, not an inline
  *     formula.
  */
object Sampling {

  /** L-2 (reference `Trainer.scala:170`). */
  def randomSplit(df: DataFrame, weights: Array[Double], seed: Long): Array[Dataset[Row]] =
    df.randomSplit(weights, seed)

  /** L-3 (reference `Trainer.scala:71, 172`). */
  def sample(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** L-4: reference partition heuristic `max(rows/10000, 2)`
    * (`Trainer.scala:172`). `rowCount` is caller-provided so this stays
    * action-free; pair with AQE for runtime coalescing.
    */
  def partitionsForRows(rowCount: Long, targetRowsPerPartition: Long = 10000L): Int =
    math.max((rowCount / targetRowsPerPartition).toInt, 2)

  def repartitionForRows(df: DataFrame, rowCount: Long,
      targetRowsPerPartition: Long = 10000L): DataFrame =
    df.repartition(partitionsForRows(rowCount, targetRowsPerPartition))

  /** Mixture sampling: draw a PER-GROUP deterministic sample sized by a
    * target map — the domain-mixing primitive of training-data
    * pipelines ("40% web, 30% code, …" becomes per-source row counts).
    * Ranking is md5-of-key, so the selection is a pure function of the
    * data: reproducible across engines, runs, and cluster sizes, and
    * stable under corpus appends (existing picks only change if new
    * rows out-rank them). One window shuffle keyed by the group; the
    * target map joins as a broadcast.
    */
  /** SCALE NOTE: the exact-count form below ranks via a per-group
    * window, which serializes each group into one task — right for
    * groups up to tens of millions of rows, wrong for a 10-billion-row
    * domain. Past that, use [[mixtureSampleApprox]]: no per-group
    * sort, counts accurate to sampling noise (±√n).
    */
  def mixtureSample(df: DataFrame, groupCol: String, keyCol: String,
      targets: Map[String, Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    require(targets.nonEmpty, "empty target mixture")
    val spark = df.sparkSession
    import spark.implicits._
    val t = targets.toSeq.toDF("__group", "__target")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.join(broadcast(t), col(groupCol) === col("__group"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__target"))
      .drop("__group", "__target", "__rn")
  }

  /** TOKEN-BUDGET mixture sampling: the domain-mixing primitive as
    * training actually consumes it — "this source contributes N
    * TOKENS", not N documents (doc counts misallocate budget whenever
    * length distributions differ across sources, which they always
    * do). Per group, documents are md5-ranked (pure function of the
    * data — reproducible across engines/runs/cluster sizes) and taken
    * while the running cost BEFORE the row stays under the group's
    * budget — so the crossing document is included and the realized
    * take overshoots by at most one document per source.
    *
    * Same scale note as [[mixtureSample]]: the running sum is a
    * per-group window (one shuffle keyed on the group). Groups beyond
    * tens of millions of rows should pre-aggregate the cost prefix per
    * hash bucket (the [[graft.llm.SeqPack]] two-phase prefix-sum
    * shape) before the cut.
    */
  def mixtureSampleByBudget(df: DataFrame, groupCol: String,
      keyCol: String, costCol: String,
      budgets: Map[String, Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    require(budgets.nonEmpty, "empty budget mixture")
    require(budgets.values.forall(_ >= 0), s"negative budget: $budgets")
    val spark = df.sparkSession
    import spark.implicits._
    val t = budgets.toSeq.toDF("__group", "__budget")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.join(broadcast(t), col(groupCol) === col("__group"))
      .withColumn("__cum_before",
        coalesce(sum(col(costCol)).over(w), lit(0L)))
      .filter(col("__cum_before") < col("__budget"))
      .drop("__group", "__budget", "__cum_before")
  }

  /** TEMPERATURE-flattened mixture sampling — the multilingual
    * up/down-sampling rule (mT5 / XLM-R): source i's share of the
    * sample is proportional to `count_i^α` with α < 1, boosting
    * low-resource sources relative to their raw share. Realized here
    * with α = 1/2 INTEGERIZED — the flattened weight is
    * `floor(sqrt(count))`, exact in both engines for counts < 2²⁶
    * per the IEEE correctly-rounded sqrt, and the target allocation
    * `totalN · w_i DIV Σw` is pure integer arithmetic — so the whole
    * allocation is replayable byte-for-byte by the oracle (a float
    * `c^α / Σc^α` would hinge on summation order). Targets cap at the
    * source's own count; selection is the same md5-of-key rank as
    * [[mixtureSample]] (pure function of the data). Plan shape: the
    * per-group count aggregate and the 1-row total both broadcast —
    * the corpus pays one window shuffle keyed on the group, nothing
    * else.
    */
  def mixtureSampleTemperature(df: DataFrame, groupCol: String,
      keyCol: String, totalN: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    require(totalN >= 0, s"negative total: $totalN")
    val counts = df.groupBy(col(groupCol).as("__group"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__w", floor(sqrt(col("__c"))).cast("long"))
    val tot = counts.agg(sum(col("__w")).as("__tw"))
    val targets = counts.crossJoin(broadcast(tot))
      .withColumn("__target",
        least(col("__c"), expr(s"(${totalN}L * __w) DIV __tw")))
      .select(col("__group"), col("__target"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.join(broadcast(targets), col(groupCol) === col("__group"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__target"))
      .drop("__group", "__target", "__rn")
  }

  /** Fraction-based mixture sampling with NO per-group sort: a row
    * survives iff the top 60 bits of md5(key) fall below its group's
    * fraction — embarrassingly parallel (a map-side filter after a
    * broadcast join), so it holds at any group size where the exact
    * form's per-group window cannot. Selection remains a pure
    * function of the data (stable across runs, engines, partition
    * counts, and corpus appends); realized counts are binomial around
    * `fraction·|group|`.
    */
  def mixtureSampleApprox(df: DataFrame, groupCol: String, keyCol: String,
      fractions: Map[String, Double]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(fractions.nonEmpty, "empty fraction mixture")
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0,1]: $fractions")
    val spark = df.sparkSession
    import spark.implicits._
    val t = fractions.toSeq.toDF("__group", "__frac")
    // 15 hex chars = 60 bits: exact in a double's 53-bit... no — keep
    // the comparison in Long space: parse 15 hex chars (60 bits < 63)
    val bucket = conv(substring(md5(col(keyCol).cast("string")), 1, 15),
      16, 10).cast("long")
    val cutoff = (col("__frac") * lit(math.pow(2.0, 60.0))).cast("long")
    df.join(broadcast(t), col(groupCol) === col("__group"))
      .filter(bucket < cutoff)
      .drop("__group", "__frac")
  }

  /** Weighted sampling without replacement, k rows per group —
    * Efraimidis-Spirakis (IPL 2006) realized WITHOUT floating point:
    * instead of ranking by u^(1/w) keys (whose ln/pow differ in the
    * last ulp across engines and would break cross-engine
    * reproducibility), each row gets `w` integer tickets and ranks by
    * its MINIMUM md5(key || "#" || ticket). The min of w iid uniforms
    * and u^(1/w) have the SAME distribution (both CDF x^w after the
    * obvious reflection), so taking the k smallest per-group min
    * tickets IS the E-S weighted k-sample — inclusion probability
    * rises with weight exactly as the textbook scheme — while every
    * comparison is an exact string compare: deterministic, portable,
    * stable under corpus appends.
    *
    * Scale shape: the ticket explode carries only (group, key, w≤
    * `maxWeight`) slim rows; the per-row min folds map-side in the
    * ticket aggregate; ranking is a BOUNDED top-k aggregate
    * ([[graft.functions.TopKMinByKey]]) whose map-side partials are
    * O(k) per task regardless of group size — no per-group window
    * sort, no group serialized into one task; payloads join back onto
    * the ≤k·groups winners at the end.
    *
    * `weightCol` must be integral and in [1, maxWeight]; out-of-range
    * weights fail loudly (a silent clamp would quietly distort the
    * sampling distribution).
    */
  def weightedSample(df: DataFrame, groupCol: String, keyCol: String,
      weightCol: String, k: Int, maxWeight: Int = 64): DataFrame = {
    import org.apache.spark.sql.functions._
    require(k > 0, s"k must be positive, got $k")
    require(maxWeight >= 1, s"maxWeight must be >= 1, got $maxWeight")
    val keyType = df.schema(keyCol).dataType.typeName
    require(Seq("byte", "short", "integer", "long").contains(keyType),
      s"weightedSample requires an integral keyCol; '$keyCol' is " +
        s"$keyType. Hash or rank string keys first.")
    val wOk = col(weightCol).isNotNull &&
      col(weightCol) >= 1 && col(weightCol) <= maxWeight
    val guarded = df.withColumn("__w",
      when(wOk, col(weightCol).cast("int")).otherwise(
        raise_error(concat(lit(s"weightedSample: $weightCol out of [1, " +
          s"$maxWeight] for key "), col(keyCol).cast("string")))))
    val tickets = guarded
      .select(col(groupCol).as("__g"), col(keyCol).cast("long").as("__k"),
        explode(sequence(lit(0), col("__w") - 1)).as("__t"))
      .groupBy(col("__g"), col("__k"))
      .agg(min(md5(concat(col("__k").cast("string"), lit("#"),
        col("__t").cast("string")))).as("__ticket"))
    val winners = tickets
      .groupBy(col("__g"))
      .agg(graft.functions.TopKMinByKey(k)(col("__ticket"), col("__k"))
        .as("__top"))
      .select(col("__g"), posexplode(col("__top")).as(Seq("__p", "__e")))
      .select(col("__g"), col("__e.id").as("__k"),
        (col("__p") + 1).as("__rn"))
    df.join(winners,
        df(groupCol) === winners("__g") && df(keyCol) === winners("__k"))
      .drop("__g", "__k", "__rn")
  }

  /** L-5: driver micro-batching (reference `collect().grouped(1000)`,
    * `ModelingStrategy.scala:100, 124`) — but via `toLocalIterator`, so
    * only one partition is resident on the driver at a time.
    */
  def microBatches(df: DataFrame, batchSize: Int = 1000): Iterator[Seq[Row]] =
    df.toLocalIterator().asScala.grouped(batchSize).map(_.toSeq)

  private implicit class IterOps[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }
}

/** C-1..C-3 persistence tiers (reference `Trainer.scala:94, 142, 174`:
  * DISK_ONLY for raw input, MEMORY_ONLY_SER for working sets).
  */
object Caching {
  def persistDisk(df: DataFrame): DataFrame = df.persist(StorageLevel.DISK_ONLY)
  def persistMemSer(df: DataFrame): DataFrame = df.persist(StorageLevel.MEMORY_ONLY_SER)
  def cache(df: DataFrame): DataFrame = df.cache()
  def unpersist(df: DataFrame): DataFrame = df.unpersist()

  /** Scoped lifecycle: persist for the duration of `body`, always
    * unpersist (reference leaks persists on exception paths,
    * `Trainer.scala:171-190`).
    */
  def withPersist[A](df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_ONLY_SER)(
      body: DataFrame => A): A = {
    df.persist(level)
    try body(df) finally df.unpersist()
  }
}
