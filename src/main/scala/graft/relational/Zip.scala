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
  * differ; ours asserts equal cardinality instead (SURVEY §7.4 item 1)
  * because silent truncation at 100 TB is data loss.
  *
  * Scale note: when all inputs share partition structure (the common case
  * — frames derived narrowly from one parent) `RDD.zipPartitions`-style
  * `zip` is shuffle-free; otherwise we fall back to the reference's
  * index-join, which shuffles each side once on the synthetic index.
  * Callers that can join on a real key should — positional identity does
  * not survive repartitioning and is discouraged for new code.
  */
object Zip {

  /** J-1: positional zip of N RDDs. */
  def zipRdds[T: scala.reflect.ClassTag](rdds: Seq[RDD[T]]): RDD[Seq[T]] = {
    require(rdds.nonEmpty, "zip of zero RDDs")
    val counts = rdds.map(_.count())
    require(counts.distinct.size == 1,
      s"positional zip requires equal row counts, got $counts")
    val sameLayout = rdds.forall(_.getNumPartitions == rdds.head.getNumPartitions)
    if (sameLayout) {
      // try the narrow path; Spark validates per-partition sizes lazily
      try {
        return rdds.map(_.map(Seq(_))).reduce((a, b) => a.zip(b).map { case (x, y) => x ++ y })
      } catch { case _: IllegalArgumentException => () }
    }
    val indexed = rdds.map(_.zipWithIndex().map(_.swap))
    indexed
      .map(_.mapValues(Seq(_)))
      .reduce((a, b) => a.join(b).mapValues { case (x, y) => x ++ y })
      .sortByKey()
      .values
  }

  /** J-2: positional zip of N DataFrames; schemas concatenate. */
  def zipFrames(spark: SparkSession, dfs: DataFrame*): DataFrame = {
    require(dfs.nonEmpty, "zip of zero frames")
    val schema = StructType(dfs.map(_.schema.fields).reduce(_ ++ _))
    val rows: RDD[Row] =
      zipRdds(dfs.map(_.rdd)).map(seq => Row.merge(seq: _*))
    spark.createDataFrame(rows, schema)
  }

  /** J-3: local seq zip (`DataframeModeler.scala:159-161`). */
  def zipLocal[T](seqs: Seq[Seq[T]]): Seq[Seq[T]] = {
    require(seqs.map(_.size).distinct.size <= 1, "unequal local zip")
    if (seqs.isEmpty) Nil else seqs.transpose
  }
}
