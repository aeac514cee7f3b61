package graft.encode

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A-1: distinct categorical key discovery.
  *
  * The reference walks every row recursively per partition, emits
  * "path=value" strings, and collects the global distinct set to the
  * driver (reference `DataframeModeler.scala:68-82, 163-170` — one
  * `mapPartitions` + `distinct` + `collect` per frame). Here the same
  * result is ONE declarative job for all columns: explode a per-row array
  * of keys, `distinct` (partial aggregation map-side, so the shuffle
  * carries only distinct keys per partition — cardinality-bound, not
  * row-count-bound, which is what makes it survive 100 TB).
  *
  * The driver-side `collect` is inherently bounded by total key
  * cardinality; `discoverKeys` caps it (SURVEY §7.4 item 7) so a
  * high-cardinality column fails loudly instead of OOMing the driver.
  */
object KeyDiscovery {

  /** Lazy frame of distinct "path=value" keys — single column `key`. */
  def keysFrame(df: DataFrame, categoricalCols: Seq[String],
      pathPrefix: String = ""): DataFrame =
    keysFrameOf(df,
      categoricalCols.map(c => (pathPrefix + c) -> col(s"`$c`")))

  /** Variant over explicit (path, column) pairs — used by the encoder for
    * nested struct leaves. Null cells key as "path=null" (the string the
    * reference's `value.toString` would produce for a boxed null — except
    * the reference NPEs there; nulls-as-a-category is the documented
    * deviation).
    */
  def keysFrameOf(df: DataFrame, leaves: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(leaves.nonEmpty, "no categorical columns given")
    val keyExprs = leaves.map { case (p, c) =>
      concat(lit(p + "="), coalesce(c.cast("string"), lit("null"))).as("key")
    }
    df.select(explode(array(keyExprs: _*)).as("key")).distinct()
  }

  /** Driver-side sorted key list with a cardinality cap. */
  def discoverKeys(df: DataFrame, categoricalCols: Seq[String],
      pathPrefix: String = "", maxKeys: Int = 1 << 20): Seq[String] = {
    val keys = keysFrame(df, categoricalCols, pathPrefix)
      .limit(maxKeys + 1).collect().map(_.getString(0))
    require(keys.length <= maxKeys,
      s"categorical key cardinality exceeds $maxKeys; " +
        "use feature hashing instead of a materialized key table")
    keys.sorted.toSeq
  }
}
