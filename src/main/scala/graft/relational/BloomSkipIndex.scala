package graft.relational

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-FILE bloom sidecar for point lookups on a non-layout column —
  * the file-skipping story [[ZOrder]] cannot tell: min/max envelopes
  * (partition values, parquet row-group stats, Z-order) prune RANGE
  * predicates on the layout columns, but a point lookup on a
  * high-cardinality column the layout ignores (order id in a
  * date-partitioned lake, user id in a source-partitioned corpus)
  * matches every file's min/max and scans the world. A bloom filter
  * per file answers "might this file contain key k?" with a bounded
  * false-positive rate, so the lookup reads ~1 file instead of all of
  * them — the same mechanism as Delta's bloom filter index and
  * Iceberg's puffin blobs, built here from public Spark pieces
  * (`input_file_name` + a typed Aggregator over
  * `org.apache.spark.util.sketch.BloomFilter`).
  *
  * Scale shape: the BUILD is one scan of the table — slim (file, key)
  * rows, one shuffle keyed by file, map-side partial blooms merged by
  * `mergeInPlace` (bloom OR is associative), one sidecar row per
  * file. The SERVE reads the sidecar (O(files) rows of `bits` bytes —
  * driver-held here; a million-file lake would partition the sidecar
  * or fold it into table metadata, same trade as every index sidecar
  * in this repo), tests the key against each bloom driver-side
  * (microseconds), and plans a scan over ONLY the candidate files.
  * Expected candidates = true hits + fpp·files.
  */
object BloomSkipIndex {

  /** Typed bloom aggregator: buffer = the sketch itself (kryo-encoded
    * — it is a bit array + params), map-side partials merge by OR.
    */
  private final class BloomAgg(expectedPerFile: Long, fpp: Double)
      extends Aggregator[Long, BloomFilter, Array[Byte]] {
    override def zero: BloomFilter =
      BloomFilter.create(math.max(expectedPerFile, 1L), fpp)
    override def reduce(b: BloomFilter, k: Long): BloomFilter = {
      b.putLong(k); b
    }
    override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b); a
    }
    override def finish(b: BloomFilter): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      b.writeTo(bos)
      bos.toByteArray
    }
    override def bufferEncoder: Encoder[BloomFilter] =
      Encoders.kryo[BloomFilter]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build the sidecar: one (file, bloom) row per data file of the
    * parquet table at `tablePath`, over integral `keyCol`.
    * `expectedPerFile` sizes the filters (overestimate ⇒ larger but
    * still-correct filters; underestimate ⇒ fpp degrades, never
    * correctness — bloom filters have no false negatives).
    */
  def build(spark: SparkSession, tablePath: String, keyCol: String,
      indexPath: String, expectedPerFile: Long,
      fpp: Double = 0.01): Unit = {
    val agg = udaf(new BloomAgg(expectedPerFile, fpp), Encoders.scalaLong)
    spark.read.parquet(tablePath)
      .select(input_file_name().as("file"),
        col(keyCol).cast("long").as("k"))
      .groupBy(col("file"))
      .agg(agg(col("k")).as("bloom"))
      .coalesce(1)
      .write.mode("overwrite").parquet(indexPath)
  }

  /** Point lookup through the sidecar: test `key` against every
    * file's bloom driver-side, scan only candidate files. Returns
    * (result, candidateFiles, totalFiles) — the file counts are the
    * skip evidence specs pin.
    */
  def lookup(spark: SparkSession, tablePath: String, indexPath: String,
      keyCol: String, key: Long): (DataFrame, Int, Int) = {
    val side = spark.read.parquet(indexPath)
      .select(col("file"), col("bloom")).collect()
    val candidates = side.filter { r =>
      BloomFilter.readFrom(
        new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        .mightContainLong(key)
    }.map(_.getString(0))
    val result =
      if (candidates.isEmpty)
        spark.read.parquet(tablePath).filter(lit(false))
      else spark.read.parquet(candidates.toIndexedSeq: _*)
        .filter(col(keyCol) === key)
    (result, candidates.length, side.length)
  }
}
