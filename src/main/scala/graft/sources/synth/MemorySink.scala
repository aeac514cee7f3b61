package graft.sources.synth

import java.util.{Map => JMap}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.metric.CustomMetric
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSourceV2 WRITE connector: a driver-side memory table with
  * the full two-phase commit protocol — each task's DataWriter buffers
  * its partition and ships it as a WriterCommitMessage; nothing becomes
  * visible until `BatchWrite.commit` atomically publishes ALL
  * partitions, and `abort` discards everything. That is the semantics
  * contract every real v2 sink (Iceberg/Delta/JDBC) implements; this
  * one trades scale for observability (the batch analogue of Spark's
  * STREAMING memory sink, which has no batch counterpart). Driver
  * memory bounds it to validation/test result sizes by design — a
  * production sink writes files/segments in tasks and commits
  * manifests, same protocol, different payload.
  *
  * Usage:
  * {{{
  *   df.write.format("graft.sources.synth.MemorySinkProvider")
  *     .option("table", "t1").mode("append").save()
  *   MemorySinkRegistry.rows("t1")   // visible only after commit
  * }}}
  */
class MemorySinkProvider extends TableProvider {
  // schema is dictated by the written frame; reads go through the
  // registry, so inference is only needed to satisfy the API
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new MemorySinkTable(properties.getOrDefault("table", "default"), schema)
}

/** Committed tables, keyed by the `table` option. */
object MemorySinkRegistry {
  private val tables = new ConcurrentHashMap[String, Seq[Row]]()
  // boxed Long on purpose: with scala.Long values the compute lambda
  // unboxes an absent key's null to 0, making a legitimate epoch 0
  // look like a replay of itself
  private val epochs = new ConcurrentHashMap[String, java.lang.Long]()
  /** Atomic publish: append merges onto previously committed rows
    * (mode("append") contract), replace drops them (truncate/overwrite). */
  private[synth] def publish(name: String, rows: Seq[Row],
      replace: Boolean): Unit =
    if (replace) tables.put(name, rows): Unit
    else tables.merge(name, rows, (a, b) => a ++ b): Unit
  /** Streaming epoch commit with EXACTLY-ONCE semantics: a restarted
    * query re-runs its last uncommitted epoch, and the engine may
    * re-deliver an epoch the sink already committed — those replays
    * must be no-ops or an at-least-once source becomes
    * duplicate-writing. Monotone epoch tracking per table gives the
    * sink side of end-to-end exactly-once (the contract real sinks
    * implement transactionally).
    */
  private[synth] def publishEpoch(name: String, epochId: Long,
      rows: Seq[Row], replace: Boolean): Unit =
    epochs.compute(name, (_, last) =>
      if (last != null && epochId <= last.longValue()) last
      else { publish(name, rows, replace); java.lang.Long.valueOf(epochId) }
    ): Unit
  def rows(name: String): Seq[Row] =
    Option(tables.get(name)).getOrElse(Seq.empty)
  def clear(name: String): Unit = {
    tables.remove(name): Unit
    epochs.remove(name): Unit
  }
}

final class MemorySinkTable(name: String, schema0: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_memsink($name)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE)
  // SupportsTruncate backs mode("overwrite") for batch AND Complete
  // output mode for streaming (the engine calls truncate() per the
  // mode): the analyzer's TRUNCATE capability claim is honored here,
  // not left to fail at runtime
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new MemoryBatchWrite(name, info.schema(), replace)
        override def toStreaming: streaming.StreamingWrite =
          new MemoryStreamingWrite(name, info.schema(), replace)
      }
    }
}

/** Commit message: one task's buffered rows (already external Rows —
  * converted task-side so the driver never touches InternalRow). */
final case class MemRows(partitionId: Int, rows: Seq[Row])
  extends WriterCommitMessage

final class MemoryBatchWrite(name: String, schema: StructType,
    replace: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new MemWriterFactory(schema)
  // atomic publish: partial results are never observable — a failed
  // task's retry re-sends its whole partition (buffered, not streamed),
  // so the commit set is exactly one message per partition
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    MemorySinkRegistry.publish(name,
      messages.map(_.asInstanceOf[MemRows]).sortBy(_.partitionId)
        .flatMap(_.rows).toSeq, replace)
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Streaming face: the same buffered-partition writers, committed per
  * EPOCH through `MemorySinkRegistry.publishEpoch` so replayed epochs
  * (restart recovery, at-least-once delivery) are no-ops — the sink
  * half of end-to-end exactly-once. Complete output mode arrives as
  * `truncate()` on the WriteBuilder ⇒ replace per epoch; Append merges.
  */
final class MemoryStreamingWrite(name: String, schema: StructType,
    replace: Boolean) extends streaming.StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory =
    new MemWriterFactory(schema)
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    MemorySinkRegistry.publishEpoch(name, epochId,
      messages.map(_.asInstanceOf[MemRows]).sortBy(_.partitionId)
        .flatMap(_.rows).toSeq, replace)
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
}

final class MemWriterFactory(schema: StructType) extends DataWriterFactory
    with streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      private val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(schema)
      private val deser = org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder(enc).resolveAndBind().createDeserializer()
      override def write(record: InternalRow): Unit =
        buf += deser(record.copy())
      override def commit(): WriterCommitMessage = MemRows(partitionId,
        buf.toSeq)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
  // streaming face: same buffering writer, epoch routed by the commit
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    createWriter(partitionId, taskId)
}
