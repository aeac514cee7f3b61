package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-FILE min/max zone-map sidecar — the RANGE-predicate complement
  * of [[BloomSkipIndex]]'s point-lookup story, and the explicit form
  * of the stats every lakehouse keeps per data file (Delta
  * data-skipping stats, Iceberg manifest bounds, parquet row-group
  * min/max one level down). A range predicate `k BETWEEN lo AND hi`
  * scans only files whose [min, max] envelope overlaps [lo, hi];
  * whether that skips anything is a property of the LAYOUT — on a
  * range-clustered table (`repartitionByRange` + sorted write, or
  * [[ZOrder]] for two dimensions) envelopes are disjoint and
  * candidates ≈ selectivity × files, while on a random layout every
  * envelope spans the domain and the zone map honestly scans the
  * world. Zone maps have no false negatives in either direction, so
  * correctness never depends on the layout.
  *
  * Scale shape: the BUILD is one scan emitting slim (file, key) rows,
  * one shuffle keyed by file (map-side partial min/max/count), one
  * sidecar row per file. The SERVE reads the O(files) sidecar
  * driver-side (three longs per file — a million-file lake would fold
  * this into table metadata, the same trade as every sidecar in this
  * repo), intersects envelopes in microseconds, and plans a scan over
  * ONLY the overlapping files.
  */
object MinMaxSkipIndex {

  /** Build the sidecar: one (file, mn, mx, n_rows) row per data file
    * of the parquet table at `tablePath`, over integral `keyCol`.
    */
  def build(spark: SparkSession, tablePath: String, keyCol: String,
      indexPath: String): Unit =
    spark.read.parquet(tablePath)
      .select(input_file_name().as("file"),
        col(keyCol).cast("long").as("k"))
      .groupBy(col("file"))
      .agg(min(col("k")).as("mn"), max(col("k")).as("mx"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(indexPath)

  /** Range lookup through the sidecar: scan only files whose envelope
    * overlaps [lo, hi]. Returns (result, candidateFiles, totalFiles) —
    * the file counts are the skip evidence specs pin.
    */
  def lookupRange(spark: SparkSession, tablePath: String,
      indexPath: String, keyCol: String, lo: Long, hi: Long)
      : (DataFrame, Int, Int) = {
    val side = spark.read.parquet(indexPath)
      .select(col("file"), col("mn"), col("mx")).collect()
    val candidates = side
      .filter(r => r.getLong(1) <= hi && r.getLong(2) >= lo)
      .map(_.getString(0))
    val result =
      if (candidates.isEmpty)
        spark.read.parquet(tablePath).filter(lit(false))
      else spark.read.parquet(candidates.toIndexedSeq: _*)
        .filter(col(keyCol).between(lo, hi))
    (result, candidates.length, side.length)
  }
}
