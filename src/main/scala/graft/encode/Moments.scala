package graft.encode

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A-2/A-3: per-column moments and derived stats.
  *
  * The reference computes raw moments `[x^0, x^1, x^2]` per row and
  * reduces per path (reference `DataframeModeler.scala:125-137, 172-176`),
  * deriving population std as `sqrt(abs(mean^2 - E[x^2]))` — population,
  * not sample, σ (reference `momentsToStats`, `DataframeModeler.scala:
  * 129-133`). Here all columns aggregate in ONE Catalyst job
  * (HashAggregate gives partial+final combine for free), and σ comes from
  * `stddev_pop`, which matches the reference's population semantics
  * without the catastrophic-cancellation quirk (SURVEY §7.4 item 3).
  */
object Moments {

  /** Per-column stats as used by the numeric transform (T-2). */
  final case class ColumnStats(path: String, n: Long, mean: Double, stdPop: Double) {
    /** Guarded σ for z-scoring: a constant column gets σ=1 so the affine
      * transform stays finite (the reference divides by 0 there).
      */
    def safeStd: Double = if (stdPop == 0.0 || stdPop.isNaN) 1.0 else stdPop
  }

  /** One-row aggregate with (n, mean, std_pop) per column. */
  private def aggExprs(cols: Seq[String]): Seq[Column] =
    cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        avg(col(c)).as(s"${c}__mean"),
        stddev_pop(col(c)).as(s"${c}__std"))
    }

  /** Lazy frame (path, n, mean, std_pop) — one row per column, one scan
    * for all columns. Values rounded for oracle comparability.
    */
  def momentsFrame(df: DataFrame, numericCols: Seq[String],
      roundTo: Int = 6): DataFrame = {
    require(numericCols.nonEmpty, "no numeric columns given")
    val one = df.agg(aggExprs(numericCols).head, aggExprs(numericCols).tail: _*)
    val stackArgs = numericCols
      .map(c => s"'$c', `${c}__n`, round(`${c}__mean`, $roundTo), round(`${c}__std`, $roundTo)")
      .mkString(", ")
    one.select(expr(
      s"stack(${numericCols.size}, $stackArgs) AS (path, n, mean, std_pop)"))
  }

  /** Driver-side stats map (tiny: one entry per column). */
  def compute(df: DataFrame, numericCols: Seq[String],
      pathPrefix: String = ""): Map[String, ColumnStats] =
    computeOf(df, numericCols.map(c => (pathPrefix + c) -> col(c)))

  /** Variant over explicit (path, column) pairs — used by the encoder for
    * nested struct leaves. Still ONE aggregate job for all paths.
    */
  def computeOf(df: DataFrame,
      leaves: Seq[(String, Column)]): Map[String, ColumnStats] = {
    require(leaves.nonEmpty, "no numeric columns given")
    val exprs = leaves.flatMap { case (p, c) =>
      Seq(count(c).as(s"${p}__n"), avg(c).as(s"${p}__mean"),
        stddev_pop(c).as(s"${p}__std"))
    }
    val row = df.agg(exprs.head, exprs.tail: _*).collect().head
    leaves.map(_._1).zipWithIndex.map { case (p, i) =>
      val base = i * 3
      val n = row.getLong(base)
      val mean = if (row.isNullAt(base + 1)) Double.NaN else row.getDouble(base + 1)
      val std = if (row.isNullAt(base + 2)) Double.NaN else row.getDouble(base + 2)
      p -> ColumnStats(p, n, mean, std)
    }.toMap
  }
}
