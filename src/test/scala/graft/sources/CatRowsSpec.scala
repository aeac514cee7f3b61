package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.catalog.CatRows

/** Inline-vs-broadcast cutover of catalog snapshot partitions: the
  * estimate must reflect ACTUAL variable-width value sizes, not
  * defaultSize's fixed ~20 bytes per string — a few rows of large
  * text would otherwise ship inline in every task binary and
  * re-trigger the large-task warning the split exists to avoid.
  */
class CatRowsSpec extends SparkSpec {
  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType)))

  test("few rows of small text ship inline (no broadcast round-trip)") {
    spark.sparkContext.hashCode(): Unit // ensure an active session
    val rows = (0 until 25).map(i => Row(i.toLong, s"name-$i"))
    val cp = CatRows.of(rows, schema)
    assert(cp.bc.isEmpty && cp.inline.size == 25)
    assert(cp.rowIterator.size == 25)
  }

  test("few rows of LARGE text ship as a broadcast, not in the task " +
      "binary") {
    val big = "x" * 200_000 // 2 rows x ~400 KB chars > 256 KiB cutover
    val rows = (0 until 2).map(i => Row(i.toLong, big))
    val cp = CatRows.of(rows, schema)
    assert(cp.bc.isDefined && cp.inline.isEmpty,
      "defaultSize-style estimation: large text rows stayed inline")
    assert(cp.rowIterator.size == 2)
  }

  test("null cells and nested arrays are sized without crashing") {
    val s = StructType(Seq(
      StructField("id", LongType),
      StructField("text", StringType),
      StructField("tags", ArrayType(StringType))))
    val rows = Seq(
      Row(1L, null, Seq("a", "b")),
      Row(2L, "t", null),
      Row(3L, "u", Seq.empty[String]))
    val cp = CatRows.of(rows, s)
    assert(cp.rowIterator.size == 3)
  }
}
