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

  /** Top-N heavy-hitter keys with their frequencies — the diagnostic
    * that decides whether salting is warranted. One aggregate job.
    */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc)
      .limit(topN)
}
