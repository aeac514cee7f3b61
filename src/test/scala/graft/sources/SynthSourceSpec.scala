package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SynthSourceSpec extends SparkSpec {

  private def read(rows: Long, slices: Int = 4) =
    spark.read.format("graft.sources.synth.SynthDocsProvider")
      .option("rows", rows.toString).option("slices", slices.toString)
      .load()

  test("generates the deterministic closed-form table") {
    val rows = read(100).collect()
    assert(rows.length == 100)
    val r42 = rows.find(_.getLong(0) == 42L).get
    assert(r42.getInt(1) == 17) // 42 % 25
    assert(r42.getDouble(2) == ((42L * 2654435761L) % 100000L) / 100.0)
    assert(r42.getString(3) == "t2")
  }

  test("id-range filters are pushed: the scan generates only the range") {
    val df = read(1000000L, slices = 8)
      .filter(col("id") >= 500 && col("id") < 600)
    // pushed range is visible in the v2 scan description
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("lo=500") && plan.contains("hi=600"), plan)
    assert(df.count() == 100)
    // the residual (non-id) filter stays post-scan but pushed id
    // bounds still narrow generation
    val mixed = read(1000000L).filter(col("id") < 50 && col("tag") === "t3")
    val mixedPlan = mixed.queryExecution.executedPlan.toString
    assert(mixedPlan.contains("hi=50"), mixedPlan)
    assert(mixed.count() == 5) // ids 3,13,23,33,43
  }

  test("column pruning reaches the reader") {
    val df = read(1000).select(col("grp"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=grp"), plan)
    assert(df.distinct().count() == 25)
  }

  test("aggregate pushdown is COMPLETE: no aggregation node in the plan") {
    val df = read(1000000L, slices = 8)
      .filter(col("id") >= 100 && col("id") < 900)
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-synth-agg"), plan)
    assert(plan.contains("count_star") && plan.contains("min_id") &&
      plan.contains("max_id"), plan)
    assert(!plan.contains("HashAggregate"), plan)
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((800L, 100L, 899L)))
  }

  test("count() OVER a completely-pushed aggregate plans and answers 1") {
    // Dataset.count() stacks an outer Aggregate(count) on the pushed
    // inner aggregate — Spark re-visits the same ScanBuilder and, if
    // the builder accepts a SECOND pushAggregation, the holder's
    // recorded output (3 cols) no longer matches the built scan
    // (1 col): "data source returns unexpected number of columns"
    // INTERNAL_ERROR (bench r7, every query runs under .count()).
    // The builder must decline re-pushes.
    val df = read(1000000L, slices = 8)
      .filter(col("id") >= 100 && col("id") < 900)
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"))
    assert(df.count() == 1L)
  }

  test("aggregate pushdown declines GROUP BY and non-id columns") {
    // grouped: source declines, Spark aggregates normally — values equal
    val grouped = read(1000).groupBy(col("grp")).agg(count(lit(1)).as("n"))
    assert(grouped.queryExecution.executedPlan.toString
      .contains("HashAggregate"))
    assert(grouped.collect().map(_.getLong(1)).sum == 1000L)
    // min over a non-id column: declined too
    val nonId = read(1000).agg(min(col("value")).as("m"))
    assert(nonId.queryExecution.executedPlan.toString
      .contains("HashAggregate"))
  }

  test("aggregate pushdown over an empty pushed range yields 0/null") {
    val df = read(1000).filter(col("id") >= 500 && col("id") < 500)
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"))
    val r = df.collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1), r.toString)
  }

  test("limit pushdown caps the generated range at the source") {
    val df = read(1000000L, slices = 8).limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hi=5"), plan) // scan itself generates 5 rows
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("runtime v2 filtering: joined dim keys prune scan partitions") {
    val fact = read(1000000L, slices = 8)
    // dim: a second synth read with a RESIDUAL (non-id) filter — stays
    // a Filter node, which is what marks the build side selective for
    // dynamic pruning (a local Seq would constant-fold the filter away)
    val dim = read(30, slices = 1).filter(col("tag") === "t3")
      .select(col("id").as("k"))
    val joined = fact.join(dim, fact("id") === col("k"))
    val rows = joined.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(3L, 13L, 23L))
    val planned = joined.queryExecution.executedPlan.toString
    // a dynamic-pruning subquery must hang off the fact scan
    assert(planned.toLowerCase.contains("dynamicpruning"), planned)
    // and the scan must have planned partitions ONLY for the dim keys:
    // numOutputRows == matches, not the 1M-row range
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[
        org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case s: QueryStageExec => scans(s.plan)
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Seq(b)
        case other => other.children.flatMap(scans)
      }
    val scanMetrics = scans(joined.queryExecution.executedPlan)
      .filter(_.scan.description().contains("hi=1000000"))
      .flatMap(_.metrics.get("numOutputRows").map(_.value))
    assert(scanMetrics.contains(3L), s"fact scan emitted $scanMetrics rows")
  }

  test("micro-batch stream over the source equals the batch read") {
    val streamed = spark.readStream
      .format("graft.sources.synth.SynthDocsProvider")
      .option("rows", "5000").option("slices", "4")
      .option("maxRowsPerBatch", "1200") // forces 5 real micro-batches
      .load()
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"))
    val got = graft.streaming.Streams.runAvailableNow(spark, streamed,
        s"synth_stream_${System.nanoTime()}",
        org.apache.spark.sql.streaming.OutputMode.Complete())
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = read(5000).groupBy(col("grp")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("empty pushed range plans zero partitions") {
    val df = read(1000).filter(col("id") >= 900 && col("id") < 900)
    assert(df.count() == 0)
  }

  test("latestOffset honors the harness-supplied ReadLimit") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import graft.sources.synth.{SynthMicroBatchStream, SynthOffset}
    import org.apache.spark.sql.types.StructType
    // constructor option says 1000/batch, but the harness passes its
    // own tighter/looser limits — the passed limit must win
    val s = new SynthMicroBatchStream(0L, 10000L, 4, new StructType(), 1000L)
    def end(l: ReadLimit): Long =
      s.latestOffset(SynthOffset(0L), l).asInstanceOf[SynthOffset].next
    assert(end(ReadLimit.maxRows(300L)) == 300L)
    assert(end(ReadLimit.allAvailable()) == 10000L)
    assert(end(ReadLimit.compositeLimit(
      Array(ReadLimit.maxRows(700L), ReadLimit.allAvailable()))) == 700L)
  }
}
