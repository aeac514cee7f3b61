package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data layout.
  *
  * At 100 TB the scan-pruning story for a two-column predicate is the
  * LAYOUT, not the plan: range-partitioning by the interleaved Z-value
  * gives every output file a tight min/max envelope on BOTH dimensions,
  * so parquet row-group statistics (and partition-level min/max) prune
  * scans for either column's predicates — a sorted-by-one-column layout
  * only ever prunes one. This is the same idea behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`, expressed with nothing but Spark built-ins:
  * the Z-value is a pure bit-interleave expression (codegen'd, no UDF)
  * and the layout step is `repartitionByRange` + sorted write.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative int columns
    * into a Z-value (x in even positions, y in odd). Pure shift/mask
    * expression tree — whole-stage codegen, no UDF.
    */
  def zValue(x: Column, y: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** The identical computation as ANSI SQL (DuckDB-runnable), for
    * oracles and for pushing the layout job to another engine.
    */
  def zValueSql(x: String, y: String, bits: Int = 8): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Cluster `df` for two-dimensional pruning: range-partition on the
    * Z-value (so files get disjoint Z-ranges ⇒ tight per-file min/max
    * on both source columns), then sort within partitions for row-group
    * locality. Write the result with any file sink; downstream scans
    * prune on either column's min/max stats.
    */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int, bits: Int = 8): DataFrame = {
    val withZ = df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
    withZ.repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
