package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: key salting.
  *
  * A shuffle join on a skewed key sends every row of the hot key to ONE
  * reducer — the straggler that defines job wall-clock at 100 TB. AQE's
  * skew-join split (on by default in [[graft.core.GraftSession]])
  * handles sort-merge joins; salting is the explicit fallback that also
  * works for hash joins, pre-AQE planners, and deliberate
  * repartitioning:
  *
  *   - fact side: each row gets a random salt in [0, salts);
  *   - dim side: replicated `salts` times (one copy per salt value);
  *   - join key becomes (key, salt) → the hot key spreads over `salts`
  *     reducers.
  *
  * Cost: dim side inflates ×salts — use only when the dim side is small
  * or the skew is crippling; `salts` trades replication for spread.
  */
object Skew {

  /** Inner equi-join of `fact` and `dim` on `key`, salted `salts` ways.
    * Column sets must be disjoint apart from the key.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 16, seed: Long = 42L): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val salted = fact.withColumn("__salt",
      (rand(seed) * salts).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** AQE skew-split inner equi-join — the mitigation a 100 TB operator
    * reaches for FIRST (salting is the manual fallback): Spark's
    * adaptive planner measures the actual shuffle-partition sizes at
    * runtime and splits any reducer partition larger than
    * max(`skewThresholdBytes`, `factor` × median) into
    * `advisoryBytes`-sized slices, each joined against a duplicated
    * copy of the other side's matching partition. Semantically
    * invisible (same rows — the oracle for `join_skew_aqe` is the
    * plain join); only the reducer-size distribution changes.
    *
    * The thresholds are session-wide knobs, so the join runs on an
    * isolated session ([[graft.core.Sessions]]) sized by the caller —
    * production defaults (256 MB threshold) are right for real
    * clusters; tests/fixtures pass KB-scale values so the split
    * observably fires. `forceOptimizeSkewedJoin` is set because a
    * downstream aggregation on the join key would otherwise make AQE
    * veto the split (it adds a shuffle) — the explicit operator exists
    * to prioritize straggler elimination over shuffle count.
    * Broadcast is disabled on the isolated session: a broadcast join
    * has no reducer skew to split, and the operator's contract is the
    * sort-merge path (`hint("merge")` pins it).
    *
    * Scope note: the returned frame is BOUND to the isolated session,
    * so everything the caller layers on top (aggregations, further
    * joins, the final write) also plans under these confs — broadcast
    * stays disabled and shuffles target `advisoryBytes`. Compose the
    * skew join as the LAST heavy step, or rebind the result onto the
    * original session ([[graft.core.Sessions.rebind]]) once the join
    * output is small.
    */
  def aqeSkewJoin(fact: DataFrame, dim: DataFrame, key: String,
      skewThresholdBytes: Long = 256L << 20,
      advisoryBytes: Long = 64L << 20,
      factor: Int = 2): DataFrame = {
    import graft.core.Sessions
    val iso = Sessions.isolated(fact.sparkSession, Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> factor.toString,
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        skewThresholdBytes.toString,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        advisoryBytes.toString,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"))
    Sessions.rebind(iso, fact).hint("merge")
      .join(Sessions.rebind(iso, dim), Seq(key))
  }

  /** Top-N heavy-hitter keys with their frequencies — the diagnostic
    * that decides whether salting is warranted. One aggregate job.
    */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc)
      .limit(topN)
}
