package graft.relational

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Positional zip — reference J-1/J-2/J-3.
  *
  * The reference's only join primitive zips N RDDs on row index
  * (`DataframeModeler.scala:252-258`: `zipWithIndex` each, RDD `join`,
  * merge) and concatenates schemas for the DataFrame variant
  * (`DataframeModeler.scala:246-250`). It silently drops rows when counts
  * differ; ours raises instead (SURVEY §7.4 item 1) because silent
  * truncation at 100 TB is data loss.
  *
  * Path selection is decided eagerly from ONE light probe job per input
  * (per-partition element counts). The probe also yields the totals for
  * the equal-cardinality check, so no extra `count()` pass exists, and —
  * unlike `RDD.zip`'s own lazy validation, which only surfaces as a task
  * failure at action time — the decision here is deterministic:
  *   - identical per-partition layouts → narrow `RDD.zip`, shuffle-free
  *     and provably safe;
  *   - anything else → `zipWithIndex` + index equi-join (one shuffle per
  *     side, no sort: positional identity is restored by the join key, so
  *     row order of the result is unspecified, same as any join).
  * Positional identity does not survive repartitioning; callers that can
  * join on a real key should — this primitive exists for reference parity
  * (label/feature/prediction splicing, `Trainer.scala:196-200`).
  */
object Zip {

  /** One job: element count of every partition (probe for path choice). */
  def partitionSizes[T](rdd: RDD[T]): Array[Long] = {
    val pairs = rdd
      .mapPartitionsWithIndex { (i, it) =>
        Iterator((i, it.foldLeft(0L)((n, _) => n + 1)))
      }
      .collect()
    val sizes = Array.fill(rdd.getNumPartitions)(0L)
    pairs.foreach { case (i, n) => sizes(i) = n }
    sizes
  }

  /** J-1: positional zip of N RDDs. Raises on unequal total counts. */
  def zipRdds[T: scala.reflect.ClassTag](rdds: Seq[RDD[T]]): RDD[Seq[T]] = {
    require(rdds.nonEmpty, "zip of zero RDDs")
    if (rdds.size == 1) return rdds.head.map(Seq(_))
    val layouts = rdds.map(partitionSizes)
    val totals = layouts.map(_.sum)
    require(totals.distinct.size == 1,
      s"positional zip requires equal row counts, got $totals")
    val narrow = layouts.forall(l => java.util.Arrays.equals(l, layouts.head))
    if (narrow)
      rdds.map(_.map(Seq(_)))
        .reduce((a, b) => a.zip(b).map { case (x, y) => x ++ y })
    else
      rdds.map(_.zipWithIndex().map(_.swap).mapValues(Seq(_)))
        .reduce((a, b) => a.join(b).mapValues { case (x, y) => x ++ y })
        .values
  }

  /** J-2: positional zip of N DataFrames; schemas concatenate. */
  def zipFrames(spark: SparkSession, dfs: DataFrame*): DataFrame = {
    require(dfs.nonEmpty, "zip of zero frames")
    val schema = StructType(dfs.map(_.schema.fields).reduce(_ ++ _))
    val rows: RDD[Row] =
      zipRdds(dfs.map(_.rdd))
        .map(seq => Row.fromSeq(seq.flatMap(_.toSeq)))
    spark.createDataFrame(rows, schema)
  }

  /** J-3: local seq zip (`DataframeModeler.scala:159-161`). */
  def zipLocal[T](seqs: Seq[Seq[T]]): Seq[Seq[T]] = {
    require(seqs.map(_.size).distinct.size <= 1, "unequal local zip")
    if (seqs.isEmpty) Nil else seqs.transpose
  }
}
