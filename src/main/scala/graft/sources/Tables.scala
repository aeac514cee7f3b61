package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table sources over the driver-provided fixture layout
  * (`TESTDATA.md`): one parquet directory per table under a scale-factor
  * directory. Parity with reference S-1 (`Trainer.scala:94`:
  * `spark.sqlContext.read.parquet(path)`), minus the S3 filesystem — the
  * path scheme is caller-provided so `s3a://` works unchanged on a
  * cluster.
  *
  * Scale note: `spark.read.parquet` gives the vectorized reader, predicate
  * pushdown and partition pruning for free; all callers must push filters
  * through these DataFrames rather than collecting.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's TimestampType (µs) cannot hold natively — the vectorized
    * reader refuses it outright. Read nanos as long and convert to a µs
    * timestamp, the same truncation DuckDB applies when it coerces
    * TIMESTAMP_NS to TIMESTAMP, so both engines see identical values.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every fixture table as a temp view (S-2 parity,
    * `Trainer.scala:95`) so `spark.sql` text works against them — the
    * reference's delegated SQL surface (`Trainer.scala:110-121`).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      // events MUST go through the nanos→µs accessor: registering the
      // raw file both exposes the wrong ts type to SQL and — worse —
      // makes registerAll itself ordering-dependent (footer-schema
      // inference throws PARQUET_TYPE_ILLEGAL unless some earlier
      // events() call already set nanosAsLong on this session)
      val df = if (n == "events") events(spark, dir) else table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
