package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.streaming.Streams

/** Fixture-drift guard. The driver regenerates /root/testdata between
  * rounds and has changed physical types before (events.ts went from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS, NTZ) on 2026-08-13, which
  * silently corrupted streaming timestamps 1000×). These tests pin the
  * contract: every fixture table loads, events.ts normalizes to
  * TimestampType with plausible values on BOTH the batch and stream
  * paths, and an unrecognizable ts type fails loudly instead of
  * producing mis-scaled values.
  */
class FixtureSchemaSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("every fixture table loads and has rows") {
    Tables.names.foreach { n =>
      val df =
        if (n == "events") Tables.events(spark, sf) else Tables.table(spark, sf, n)
      assert(df.columns.nonEmpty, s"$n: no columns")
      assert(df.limit(1).count() == 1, s"$n: empty")
    }
  }

  test("batch events.ts normalizes to TimestampType with plausible range") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType == TimestampType)
    val yr = df.select(year(min("ts")).as("lo"), year(max("ts")).as("hi")).head()
    assert(yr.getInt(0) >= 1990 && yr.getInt(1) <= 2100,
      s"ts out of plausible range: years ${yr.getInt(0)}..${yr.getInt(1)} — " +
      "a unit mis-scale (nanos-vs-micros) would land far outside this window")
  }

  test("stream events.ts equals batch events.ts exactly (no unit drift)") {
    val streamed = Streams.runAvailableNow(spark,
      Streams.eventsStream(spark, stagedEventsDir), "fixture_ts_check",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batch = Tables.events(spark, sf)
    assert(streamed.schema("ts").dataType == TimestampType)
    val sAgg = streamed.agg(min("ts"), max("ts"), count(lit(1))).head()
    val bAgg = batch.agg(min("ts"), max("ts"), count(lit(1))).head()
    assert(sAgg == bAgg, s"stream/batch ts divergence: $sAgg vs $bAgg")
  }

  private def stagedEventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("fixture_guard")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("part-0.parquet"))
    dir.toString
  }

  test("un-annotated INT64 ts fails loudly, never divides blindly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bad_ts").toString
    // Spark writes LongType as plain INT64 — no timestamp annotation
    Seq((1L, 1690000000000000L, 5L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    val raw = spark.read.parquet(dir)
    val ex = intercept[IllegalStateException] {
      Tables.normalizeEventsTs(spark, raw, dir)
    }
    assert(ex.getMessage.contains("unknown scale") ||
      ex.getMessage.contains("NANOS"),
      s"expected the footer-probe refusal, got: ${ex.getMessage}")
  }

  test("string ts fails loudly with the unsupported-type message") {
    import spark.implicits._
    val df = Seq("2024-01-01T00:00:00").toDF("ts")
    val ex = intercept[IllegalStateException] {
      Tables.normalizeEventsTs(spark, df, "in-memory")
    }
    assert(ex.getMessage.contains("unsupported ts type"))
  }

  test("TIMESTAMP_NTZ ts is cast, value-preserved under UTC session tz") {
    import spark.implicits._
    val ntz = spark.sql(
      "select timestamp_ntz'2024-06-01 12:34:56.789' as ts")
    val out = Tables.normalizeEventsTs(spark, ntz, "in-memory")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS"))
      .head().getString(0) == "2024-06-01 12:34:56.789")
  }
}
