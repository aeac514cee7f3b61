package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.synth.MemorySinkRegistry

class MemorySinkSpec extends SparkSpec {
  import spark.implicits._

  test("two-phase commit publishes all partitions atomically") {
    MemorySinkRegistry.clear("ms_roundtrip")
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(5)
    df.write.format("graft.sources.synth.MemorySinkProvider")
      .option("table", "ms_roundtrip").mode("append").save()
    val got = MemorySinkRegistry.rows("ms_roundtrip")
    assert(got.length == 100)
    assert(got.map(_.getLong(0)).toSet == (1L to 100L).toSet)
    assert(got.find(_.getLong(0) == 7L).get.getString(1) == "v7")
  }

  test("append accumulates; overwrite truncates") {
    MemorySinkRegistry.clear("ms_modes")
    def write(range: Range, mode: String): Unit =
      range.map(i => (i.toLong, s"v$i")).toDF("id", "s")
        .write.format("graft.sources.synth.MemorySinkProvider")
        .option("table", "ms_modes").mode(mode).save()
    write(1 to 10, "append")
    write(11 to 15, "append")
    assert(MemorySinkRegistry.rows("ms_modes").map(_.getLong(0)).toSet ==
      (1L to 15L).toSet)
    write(21 to 23, "overwrite")
    assert(MemorySinkRegistry.rows("ms_modes").map(_.getLong(0)).toSet ==
      (21L to 23L).toSet)
  }

  test("streaming epoch replay is idempotent; later epochs land") {
    import graft.sources.synth.{MemoryStreamingWrite, MemRows}
    import org.apache.spark.sql.connector.write.WriterCommitMessage
    import org.apache.spark.sql.Row
    MemorySinkRegistry.clear("ms_epochs")
    val w = new MemoryStreamingWrite("ms_epochs",
      org.apache.spark.sql.types.StructType(Seq()), replace = false)
    def msg(v: Long): Array[WriterCommitMessage] =
      Array(MemRows(0, Seq(Row(v))))
    w.commit(0L, msg(1L))
    w.commit(0L, msg(1L)) // replayed epoch: must be a no-op
    w.commit(1L, msg(2L))
    w.commit(0L, msg(9L)) // stale replay after progress: no-op too
    val got = MemorySinkRegistry.rows("ms_epochs").map(_.getLong(0))
    assert(got == Seq(1L, 2L), s"append mode: one row per real epoch, got $got")
    // complete-mode (replace) epochs supersede
    MemorySinkRegistry.clear("ms_epochs2")
    val wc = new MemoryStreamingWrite("ms_epochs2",
      org.apache.spark.sql.types.StructType(Seq()), replace = true)
    wc.commit(0L, msg(1L)); wc.commit(1L, msg(5L)); wc.commit(1L, msg(7L))
    assert(MemorySinkRegistry.rows("ms_epochs2").map(_.getLong(0)) == Seq(5L))
  }

  test("a failed job publishes nothing (abort path)") {
    MemorySinkRegistry.clear("ms_abort")
    val boom = udf((i: Long) =>
      if (i == 50L) throw new RuntimeException("boom") else i)
    val df = (1L to 100L).toDF("id").repartition(4)
      .select(boom(col("id")).as("id"))
    intercept[Exception] {
      df.write.format("graft.sources.synth.MemorySinkProvider")
        .option("table", "ms_abort").mode("append").save()
    }
    assert(MemorySinkRegistry.rows("ms_abort").isEmpty)
  }
}
