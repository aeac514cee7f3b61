package graft.sources.synth

import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.{aggregate, NamedReference}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2 connector: a deterministic synthetic table whose
  * every cell is a PURE FUNCTION of the row id — so an external oracle
  * can re-derive the whole table closed-form (`generate_series` +
  * the same integer arithmetic) and hash-check queries over it.
  *
  * The point is the CONNECTOR surface, not the data: the ScanBuilder
  * implements real FILTER PUSHDOWN (id-range predicates narrow the
  * generated range — the source-side analogue of parquet row-group
  * pruning: pushed filters mean rows are never materialized at all)
  * and COLUMN PRUNING (readers emit only requested fields). Input
  * splits carve the id range into `slices` partitions, so the scan
  * parallelizes like any file source.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.synth.SynthDocsProvider")
  *     .option("rows", 100000).option("slices", 8).load()
  * }}}
  */
class SynthDocsProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "4").toInt)
}

object SynthTable {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", IntegerType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  /** id → cell values; the oracle replays exactly this arithmetic. */
  def grpOf(id: Long): Int = (id % 25).toInt
  def valueOf(id: Long): Double = ((id * 2654435761L) % 100000L) / 100.0
  def tagOf(id: Long): String = "t" + (id % 10)
}

final class SynthTable(rows: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SynthTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, slices,
      options.getLong("maxRowsPerBatch", 0L))
}

/** Pushdown state: id-range predicates tighten [lo, hi); a pushed
  * LIMIT caps the range end; a pushed AGGREGATE (COUNT(*) / MIN(id) /
  * MAX(id), no GROUP BY) collapses the scan to ONE closed-form row —
  * the source-side answer never materializes a single data row, the
  * DSv2 analogue of parquet footer-statistics aggregation. Everything
  * else is left for Spark to evaluate post-scan.
  */
final class SynthScanBuilder(rows: Long, slices: Int,
    maxRowsPerBatch: Long)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownAggregates {
  private var lo = 0L
  private var hi = rows
  private var required: StructType = SynthTable.Schema
  private var limit: Long = -1L
  private var aggFuncs: Array[String] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val rest = ArrayBuffer.empty[Filter]
    filters.foreach {
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case IsNotNull("id") => // non-nullable: vacuous, absorb it
      case other => rest += other
    }
    // everything not absorbed must be re-checked by Spark
    rest.toArray
  }
  override def pushedFilters(): Array[Filter] =
    Array(GreaterThanOrEqual("id", lo), LessThan("id", hi))
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Fully honored: the scan generates at most `l` rows, so Spark's
    * own limit on top becomes a no-op pass-through.
    */
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed(): Boolean = false

  /** COUNT(*)/MIN(id)/MAX(id) with no GROUP BY are closed-form over
    * [lo, hi) — COMPLETE pushdown (Spark plans no aggregation node at
    * all; the scan returns the final one-row answer). Anything else is
    * declined and runs as a normal aggregation over the scan.
    */
  private def supported(agg: aggregate.Aggregation): Option[Array[String]] = {
    def idRef(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case nr: org.apache.spark.sql.connector.expressions.NamedReference =>
          nr.fieldNames.sameElements(Array("id"))
        case _ => false
      }
    // an EMPTY aggregation must be declined, not "completely pushed":
    // under an outer Dataset.count() Spark's column pruning can strip
    // the inner aggregate to zero expressions, and accepting it makes
    // aggFuncs empty → build() returns the DATA scan while the holder
    // expects 0 aggregate columns — the readSchema mismatch
    // INTERNAL_ERROR bench r7 hit on every `.count()`-driven run
    if (agg.groupByExpressions.nonEmpty || agg.aggregateExpressions.isEmpty)
      None
    else {
      val fns = agg.aggregateExpressions.map {
        case _: aggregate.CountStar => "count_star"
        case m: aggregate.Min if idRef(m.column) => "min_id"
        case m: aggregate.Max if idRef(m.column) => "max_id"
        case _ => return None
      }
      Some(fns)
    }
  }
  // Decline any SECOND aggregation push: Dataset.count() stacks an
  // outer Aggregate(count) on the pushed one, and Spark re-visits the
  // same builder — accepting the re-push desyncs the holder's recorded
  // 3-column output from the 1-column scan it then builds ("data
  // source returns unexpected number of columns" INTERNAL_ERROR). One
  // builder, one pushed aggregate; the outer count runs post-scan.
  override def supportCompletePushDown(agg: aggregate.Aggregation): Boolean =
    aggFuncs.isEmpty && supported(agg).isDefined
  override def pushAggregation(agg: aggregate.Aggregation): Boolean =
    if (aggFuncs.nonEmpty) false
    else supported(agg) match {
      case Some(fns) => aggFuncs = fns; true
      case None => false
    }

  override def build(): Scan = {
    val end = if (limit >= 0) math.min(hi, lo + limit) else hi
    if (aggFuncs.nonEmpty) new SynthAggScan(lo, end, aggFuncs)
    else new SynthScan(lo, end, slices, required, maxRowsPerBatch)
  }
}

/** Completely-pushed aggregate: one partition, one closed-form row.
  * COUNT(*) = hi−lo; MIN/MAX(id) = the range ends (null on an empty
  * range, matching aggregate semantics). No data row is ever built.
  */
final class SynthAggScan(lo: Long, hi: Long, fns: Array[String])
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(fns.zipWithIndex.map { case (f, i) =>
      StructField(s"agg_$i" + "_" + f, LongType, nullable = f != "count_star")
    })
  override def description(): String =
    s"graft-synth-agg lo=$lo hi=$hi fns=${fns.mkString(",")}"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthRange(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      private val localFns = fns
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val r = p.asInstanceOf[SynthRange]
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = { val go = !emitted; emitted = true; go }
          override def get(): InternalRow = {
            val n = math.max(0L, r.until - r.from)
            new GenericInternalRow(localFns.map[Any] {
              case "count_star" => n
              case "min_id" => if (n == 0) null else r.from
              case "max_id" => if (n == 0) null else r.until - 1
            })
          }
          override def close(): Unit = ()
        }
      }
    }
}

final class SynthScan(lo: Long, hi: Long, slices: Int,
    required: StructType, maxRowsPerBatch: Long) extends Scan with Batch
    with SupportsRuntimeV2Filtering with SupportsReportStatistics {
  /** Honest post-pushdown statistics: row count is exactly the pushed
    * range, bytes are schema width × rows. Without these Spark assumes
    * the source is huge and will never auto-broadcast it — which also
    * silently disables dynamic pruning (reuseBroadcastOnly finds no
    * broadcast to reuse and degrades the filter to `true`). Stats
    * reporting is what lets the planner pick broadcast joins for small
    * v2 tables, the same decision file sources get from file sizes.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, hi - lo)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(n * math.max(1, required.defaultSize))
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(n)
  }
  // RUNTIME filtering (the DSv2 dynamic-partition-pruning contract):
  // a join against a filtered broadcast dim delivers the dim's id set
  // AFTER the build side runs, and partitions for pruned ids are never
  // planned — at 100 TB this turns a fact-scan into reads of only the
  // joined keys' slices, the v2 analogue of DPP on hive partitions.
  // Unsupported predicates are ignored (pruning is an optimization;
  // Spark re-applies the join condition anyway).
  private var kept: Option[Array[Long]] = None
  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))
  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    def idsOf(p: org.apache.spark.sql.connector.expressions.filter.Predicate)
        : Option[Array[Long]] = p.name() match {
      case "IN" | "=" =>
        val vals = p.children().toSeq.collect {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.value().isInstanceOf[Long] => l.value().asInstanceOf[Long]
        }
        // first child must be the id column; literals must cover the rest
        val isId = p.children().headOption.exists {
          case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
          case _ => false
        }
        if (isId && vals.length == p.children().length - 1) Some(vals.toArray)
        else None
      case _ => None
    }
    predicates.foreach { p =>
      idsOf(p).foreach { ids =>
        val inRange = ids.filter(i => i >= lo && i < hi).sorted.distinct
        kept = Some(kept.fold(inRange)(prev => prev.intersect(inRange)))
      }
    }
  }
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-synth lo=$lo hi=$hi cols=${required.fieldNames.mkString(",")}"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = kept match {
    case None => SynthScan.split(lo, hi, slices)
    case Some(ids) =>
      // contiguous runs of kept ids become ranges; pruned ids get NO
      // partition at all
      val parts = ArrayBuffer.empty[InputPartition]
      var i = 0
      while (i < ids.length) {
        var j = i
        while (j + 1 < ids.length && ids(j + 1) == ids(j) + 1) j += 1
        parts += SynthRange(ids(i), ids(j) + 1)
        i = j + 1
      }
      parts.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SynthMicroBatchStream(lo, hi, slices, required, maxRowsPerBatch)
}

object SynthScan {
  def split(from: Long, until: Long, slices: Int): Array[InputPartition] = {
    val n = math.max(0L, until - from)
    if (n == 0) Array.empty
    else {
      val k = math.min(slices.toLong, n).toInt
      Array.tabulate(k) { i =>
        SynthRange(from + n * i / k, from + n * (i + 1) / k)
      }
    }
  }
}

/** Streaming face of the same table: the offset is simply the next
  * unread id, so micro-batch N covers [startOffset, endOffset) of the
  * identical closed-form rows the batch scan generates. Admission
  * control (`maxRowsPerBatch`) throttles each micro-batch the way a
  * real source paces a firehose; AvailableNow runs the remaining range
  * to completion and stops. Offsets are plain longs in the checkpoint
  * log, so restart-resume works like any production source.
  */
final case class SynthOffset(next: Long) extends Offset {
  override def json(): String = next.toString
}

final class SynthMicroBatchStream(lo: Long, hi: Long, slices: Int,
    required: StructType, maxRowsPerBatch: Long)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  private var availableNowEnd: Long = hi
  override def initialOffset(): Offset = SynthOffset(lo)
  override def deserializeOffset(json: String): Offset =
    SynthOffset(json.trim.toLong)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SynthOffset].next
    // honor the HARNESS-supplied limit (it is usually the default one,
    // but Trigger.AvailableNow and composite limits substitute others):
    // a max-rows term caps the batch end; anything else reads all
    def capOf(l: ReadLimit): Long = l match {
      case mr: ReadMaxRows => s + mr.maxRows()
      case c: CompositeReadLimit => c.getReadLimits.map(capOf).min
      case _ => availableNowEnd
    }
    SynthOffset(math.min(availableNowEnd, math.max(s, capOf(limit))))
  }
  override def getDefaultReadLimit: ReadLimit =
    if (maxRowsPerBatch > 0) ReadLimit.maxRows(maxRowsPerBatch)
    else ReadLimit.allAvailable()
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = hi
  override def reportLatestOffset(): Offset = SynthOffset(availableNowEnd)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    SynthScan.split(start.asInstanceOf[SynthOffset].next,
      end.asInstanceOf[SynthOffset].next, slices)
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class SynthRange(from: Long, until: Long) extends InputPartition

final class SynthReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SynthRange]
    new PartitionReader[InternalRow] {
      private var id = r.from - 1
      override def next(): Boolean = { id += 1; id < r.until }
      override def get(): InternalRow =
        new GenericInternalRow(fields.map[Any] {
          case "id" => id
          case "grp" => SynthTable.grpOf(id)
          case "value" => SynthTable.valueOf(id)
          case "tag" => UTF8String.fromString(SynthTable.tagOf(id))
        })
      override def close(): Unit = ()
    }
  }
}
