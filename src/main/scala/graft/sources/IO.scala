package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink surface beyond the parquet fixtures — S-1/S-5/S-6 parity
  * plus the formats Spark gives for free (csv/json), which the
  * reference's delegated SQL surface implies but never authors.
  *
  * The reference's only sink is notebook display (`SparkRepl.out`,
  * reference `Trainer.scala:196-200`); a real engine needs file sinks.
  * Writers default to overwrite semantics and caller-controlled
  * partition counts — at scale, the partition count of the write IS the
  * file count, so it's never hidden.
  */
object IO {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String,
      header: Boolean = true, inferSchema: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def writeParquet(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite,
      partitions: Option[Int] = None): Unit =
    // repartition, not coalesce: the requested count must hold in both
    // directions (coalesce silently ignores increases and can collapse
    // upstream parallelism into one task)
    partitions.fold(df)(df.repartition).write.mode(mode).parquet(path)

  /** Hive-style partitioned layout (`path/col=value/...`) — the layout
    * that makes downstream scans partition-prunable on the partition
    * columns; the right shape for date/tenant-keyed 100 TB datasets.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  def writeCsv(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite, header: Boolean = true): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** ORC twin of the parquet path — the other columnar format Spark
    * ships natively. Same predicate-pushdown / column-pruning contract
    * as parquet (ORC carries min/max + bloom stripe stats), so a
    * consumer locked into an ORC lake gets the identical scan-side
    * behavior.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** S-5: row-count action (reference `Trainer.scala:96` logs it at
    * load).
    */
  def rowCount(df: DataFrame): Long = df.count()

  /** Small-files compaction: rewrite a parquet directory at a chosen
    * file count. The small-files problem IS a 100 TB problem — a table
    * accreted by thousands of micro-batches pays per-file open/footer
    * costs on every scan and floods the driver's file index; periodic
    * compaction to ~128 MB-1 GB files restores scan throughput.
    * Returns the row count of the compacted copy (cheap integrity
    * check: must equal the source's).
    */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
      targetFiles: Int): Long = {
    require(targetFiles > 0, s"targetFiles must be positive, got $targetFiles")
    // Overwrite-into-source would delete srcDir while the rewrite job
    // is still reading it — losing the table. Path normalizes trailing
    // slashes / schemes so "dir" vs "dir/" is caught too.
    require(new org.apache.hadoop.fs.Path(srcDir) !=
        new org.apache.hadoop.fs.Path(dstDir),
      s"compact dstDir must differ from srcDir (got both = $srcDir): " +
        "overwriting the directory being read loses the table")
    spark.read.parquet(srcDir)
      .repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(dstDir)
    spark.read.parquet(dstDir).count()
  }

  /** Size-targeted write: pick the partition count from Catalyst's
    * size estimate so output files land near `targetBytes` (the
    * 128 MB–1 GB band where parquet scan throughput lives). The
    * estimate is the optimizer's — cheap and available before any
    * action — so this is a planning-time knob, not a second pass over
    * the data; compression typically lands files below the in-memory
    * estimate, which errs toward smaller-not-huge files.
    */
  def writeSized(df: DataFrame, path: String,
      targetBytes: Long = 128L * 1024 * 1024,
      mode: SaveMode = SaveMode.Overwrite): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val estimated = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = math.max(1,
      math.min((estimated / BigInt(targetBytes)).toLong + 1, 100000L)).toInt
    df.repartition(parts).write.mode(mode).parquet(path)
    parts
  }

  /** Retention expiry over a partitioned table: delete the partition
    * directories whose (string-comparable) partition value sorts below
    * `cutoff` — e.g. `day=2024-01-01` dirs under a date-partitioned
    * table. Deleting WHOLE partitions is the only delete that is free
    * at 100 TB (no rewrite, no tombstones, atomic per directory);
    * row-level retention belongs in a rewrite job instead. Returns the
    * deleted partition values.
    */
  def expirePartitions(spark: SparkSession, dir: String,
      partitionCol: String, cutoff: String): Seq[String] = {
    val root = new java.io.File(dir)
    require(root.isDirectory, s"$dir is not a directory")
    val prefix = s"$partitionCol="
    val expired = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .filter(_.getName.stripPrefix(prefix) < cutoff)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    expired.foreach(rm)
    expired.map(_.getName.stripPrefix(prefix)).toSeq.sorted
  }

  /** S-6: display sink — the reference's only sink
    * (`SparkRepl.out(df.cache())`). Returns the shown string so
    * callers/tests can capture it instead of stdout-only.
    */
  def display(df: DataFrame, rows: Int = 20, truncate: Int = 20): String =
    df.showString(rows, truncate, vertical = false)

  /** Implicit access to the package-private showString. */
  implicit private class ShowOps(df: DataFrame) {
    def showString(rows: Int, truncate: Int, vertical: Boolean): String = {
      // public API route: limit + collect formatted driver-side
      val cols = df.columns
      val data = df.limit(rows).collect()
      val header = cols.mkString(" | ")
      val lines = data.map(_.toSeq.map { v =>
        val s = String.valueOf(v)
        if (truncate > 0 && s.length > truncate) s.take(truncate - 1) + "…" else s
      }.mkString(" | "))
      (header +: lines).mkString("\n")
    }
  }
}
