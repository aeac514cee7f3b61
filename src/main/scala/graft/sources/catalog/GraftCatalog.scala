package graft.sources.catalog

import java.util.{Map => JMap}
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform, Literal => V2Literal}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom V2 CATALOG PLUGIN (`CatalogPlugin`/`TableCatalog`): the
  * extension point that serves whole SQL namespaces — `CREATE TABLE
  * graft_cat.ns.t`, `INSERT INTO`, `DELETE FROM`, `SHOW TABLES`,
  * `DESCRIBE` all route through this class once
  * `spark.sql.catalog.graft_cat` names it. This is how lakehouse
  * formats (Iceberg/Delta/JDBC federations) plug in: the catalog maps
  * identifiers to [[GraftMemTable]]s, each implementing the read
  * (scan), write (two-phase commit append/truncate) and row-level
  * DELETE (`SupportsDeleteV2`: filter-based, source-side) contracts.
  * Tables are driver-memory buffers — validation-scale by design, the
  * same trade as [[graft.sources.synth.MemorySinkRegistry]]; a
  * production catalog persists manifests, same interfaces.
  *
  * Registered lazily via `spark.conf.set("spark.sql.catalog.<name>",
  * classOf[GraftCatalog].getName)` — catalogs resolve on first
  * reference, so no session-construction hook is needed.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName = "graft_cat"
  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catalogName = name
  override def name(): String = catalogName

  private def key(ident: Identifier): String =
    (ident.namespace :+ ident.name).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] =
    GraftCatalog.tables.keySet.asScala
      .map(_.split('.')).filter(_.init.sameElements(namespace))
      .map(parts => Identifier.of(parts.init, parts.last)).toArray

  override def loadTable(ident: Identifier): Table =
    Option(GraftCatalog.tables.get(key(ident)))
      .getOrElse(throw new NoSuchTableException(ident))

  /** TIME TRAVEL: `SELECT … FROM t VERSION AS OF v` resolves through
    * this overload — serve the immutable snapshot the table recorded
    * at commit v (v0 = empty at creation; each INSERT/OVERWRITE/
    * DELETE/TRUNCATE appended one). Non-numeric or out-of-range
    * versions fail the statement up front.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = loadTable(ident) match {
      case m: GraftMemTable => m
      case other => throw new UnsupportedOperationException(
        s"time travel unsupported for ${other.name()}")
    }
    val v = try version.toInt
    catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"non-numeric version '$version' for ${key(ident)}")
    }
    t.pinnedAt(v)
  }

  /** `TIMESTAMP AS OF` overload: Spark hands the timestamp in
    * MICROseconds; serve the latest snapshot committed at or before
    * it.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val t = loadTable(ident) match {
      case m: GraftMemTable => m
      case other => throw new UnsupportedOperationException(
        s"time travel unsupported for ${other.name()}")
    }
    t.pinnedAt(t.versionAt(timestampMicros))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    val t = new GraftMemTable(key(ident), schema)
    if (GraftCatalog.tables.putIfAbsent(key(ident), t) != null)
      throw new TableAlreadyExistsException(ident)
    t
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE not supported")

  override def dropTable(ident: Identifier): Boolean =
    GraftCatalog.tables.remove(key(ident)) != null

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val t = Option(GraftCatalog.tables.remove(key(oldIdent)))
      .getOrElse(throw new NoSuchTableException(oldIdent))
    if (GraftCatalog.tables.putIfAbsent(key(newIdent),
        t.renamed(key(newIdent))) != null)
      throw new TableAlreadyExistsException(newIdent)
  }

  // -- SupportsNamespaces: flat, implicit namespaces (any single-level
  // namespace exists; listing reflects the tables present)
  override def listNamespaces(): Array[Array[String]] =
    GraftCatalog.tables.keySet.asScala.map(_.split('.').init.toSeq)
      .toSet.map((s: Seq[String]) => s.toArray).toArray
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1
  override def loadNamespaceMetadata(namespace: Array[String])
      : JMap[String, String] =
    if (namespaceExists(namespace)) java.util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)
  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = ()
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE not supported")
  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    if (cascade) listTables(namespace)
      .foreach(i => dropTable(i)): Unit
    true
  }
}

object GraftCatalog {
  /** Process-wide table store so every session/runner in the JVM sees
    * one catalog (the semantics of a shared metastore).
    */
  private[catalog] val tables = new ConcurrentHashMap[String, GraftMemTable]()
  /** Test/verify hygiene: drop everything. */
  def reset(): Unit = tables.clear()
}

/** A catalog-managed driver-memory table: batch read, two-phase-commit
  * batch write (append + truncate-backed overwrite), and filter-based
  * row-level DELETE. Row payloads live behind a lock; scans snapshot.
  */
final class GraftMemTable(fullName: String, schema0: StructType)
    extends Table with SupportsRead with SupportsWrite with SupportsDeleteV2 {

  private val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
  /** Immutable row-set per committed version; v0 = the empty table at
    * creation. Every commit (INSERT/CTAS/OVERWRITE), DELETE, and
    * TRUNCATE appends one snapshot — the Iceberg-style history that
    * `VERSION AS OF` serves. Driver-memory table ⇒ snapshots are
    * cheap Seq references (rows are immutable).
    */
  private val history =
    scala.collection.mutable.ArrayBuffer[Seq[Row]](Seq.empty)
  /** Commit timestamps (µs), strictly increasing even when commits
    * land inside one clock tick — what `TIMESTAMP AS OF` binds to.
    */
  private val commitTsMicros =
    scala.collection.mutable.ArrayBuffer[Long](
      System.currentTimeMillis() * 1000L)
  private def record(): Unit = {
    history += buf.toSeq
    commitTsMicros += math.max(System.currentTimeMillis() * 1000L,
      commitTsMicros.last + 1)
  }
  /** Latest version whose commit time is ≤ ts (µs) — the
    * `TIMESTAMP AS OF` resolution rule. Fails up front for a
    * timestamp before the table existed.
    */
  private[catalog] def versionAt(tsMicros: Long): Int = synchronized {
    val v = commitTsMicros.lastIndexWhere(_ <= tsMicros)
    if (v < 0)
      throw new IllegalArgumentException(
        s"$fullName did not exist at timestamp $tsMicros")
    v
  }
  private def snapshot(): Seq[Row] = synchronized(buf.toSeq)
  private[catalog] def currentVersion: Int = synchronized(history.size - 1)
  private[catalog] def versionRows(v: Int): Seq[Row] = synchronized {
    if (v < 0 || v >= history.size)
      throw new IllegalArgumentException(
        s"no version $v of $fullName (latest: ${history.size - 1})")
    history(v)
  }
  private[catalog] def publish(rows: Seq[Row], replace: Boolean): Unit =
    synchronized {
      if (replace) buf.clear()
      buf ++= rows
      record()
    }

  private[catalog] def renamed(newName: String): GraftMemTable = {
    val t = new GraftMemTable(newName, schema0)
    synchronized {
      t.buf ++= buf
      t.history.clear()
      t.history ++= history
      t.commitTsMicros.clear()
      t.commitTsMicros ++= commitTsMicros
    }
    t
  }

  /** Read-only view of this table pinned at `version` — what
    * `SELECT … FROM t VERSION AS OF v` resolves to.
    */
  private[catalog] def pinnedAt(version: Int): Table = {
    val rows = versionRows(version) // validate eagerly: bad version fails the query up front
    val outer = this
    new Table with SupportsRead {
      override def name(): String = s"${outer.name()}@v$version"
      override def schema(): StructType = schema0
      override def capabilities(): java.util.Set[TableCapability] =
        java.util.EnumSet.of(TableCapability.BATCH_READ)
      override def newScanBuilder(
          options: CaseInsensitiveStringMap): ScanBuilder =
        outer.scanBuilderFor(rows)
    }
  }

  override def name(): String = s"graft_cat_table($fullName)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  // ------------------------------------------------------------- read
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    scanBuilderFor(snapshot())

  private[catalog] def scanBuilderFor(rowsAt: Seq[Row]): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        private val rows = rowsAt
        override def readSchema(): StructType = schema0
        override def description(): String =
          s"graft-cat-scan $fullName rows=${rows.length}"
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array(CatRows(rows, schema0))
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(p: InputPartition)
                : PartitionReader[InternalRow] = {
              val cp = p.asInstanceOf[CatRows]
              new PartitionReader[InternalRow] {
                // serializer built task-side from the serializable schema
                private val ser = org.apache.spark.sql.catalyst.encoders
                  .ExpressionEncoder(org.apache.spark.sql.catalyst.encoders
                    .RowEncoder.encoderFor(cp.schema))
                  .resolveAndBind().createSerializer()
                private val it = cp.rows.iterator
                private var cur: InternalRow = _
                override def next(): Boolean = {
                  val has = it.hasNext
                  if (has) cur = ser(it.next()).copy()
                  has
                }
                override def get(): InternalRow = cur
                override def close(): Unit = ()
              }
            }
          }
      }
    }

  // ------------------------------------------------------------ write
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(
              info2: PhysicalWriteInfo): DataWriterFactory =
            new graft.sources.synth.MemWriterFactory(info.schema())
          override def commit(messages: Array[WriterCommitMessage]): Unit =
            publish(messages
              .map(_.asInstanceOf[graft.sources.synth.MemRows])
              .sortBy(_.partitionId).flatMap(_.rows).toSeq, replace)
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }

  // ----------------------------------------------------------- delete
  /** Filter-based DELETE, evaluated source-side — the
    * `SupportsDeleteV2` contract `DELETE FROM t WHERE …` plans to when
    * the condition translates to connector predicates. Unsupported
    * predicate shapes are rejected in [[canDeleteWhere]], so Spark
    * fails the statement up front instead of half-deleting.
    */
  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    predicates.forall(p => PredicateEval.supported(p, schema0))
  override def deleteWhere(predicates: Array[Predicate]): Unit =
    synchronized {
      val keep = buf.filterNot(r =>
        predicates.forall(p => PredicateEval.eval(p, r, schema0)))
      buf.clear()
      buf ++= keep
      record()
    }
  override def truncateTable(): Boolean = {
    synchronized { buf.clear(); record() }
    true
  }
}

/** One partition carrying the snapshot (driver-memory table: the rows
  * ship in the task closure exactly once).
  */
final case class CatRows(rows: Seq[Row], schema: StructType)
  extends InputPartition

/** Tiny driver-side evaluator for connector [[Predicate]]s over
  * external Rows — enough for the DELETE surface (comparisons,
  * IN, null checks, AND/OR/NOT on top-level columns). V2 literals
  * carry Catalyst-internal values (UTF8String, Decimal); they convert
  * to the external representation before comparing.
  */
private[catalog] object PredicateEval {
  private def fieldIndex(e: org.apache.spark.sql.connector.expressions.Expression,
      schema: StructType): Option[Int] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      val i = schema.fieldNames.indexOf(nr.fieldNames.head)
      if (i >= 0) Some(i) else None
    case _ => None
  }
  private def literal(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[Any] = e match {
    case l: V2Literal[_] =>
      Some(org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToScala(l.value, l.dataType))
    case _ => None
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: Number, y: Number) =>
      Some(java.lang.Double.compare(x.doubleValue(), y.doubleValue()))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  def supported(p: Predicate, schema: StructType): Boolean = p.name() match {
    case "AND" | "OR" | "NOT" =>
      p.children().forall {
        case c: Predicate => supported(c, schema)
        case _ => false
      }
    case "=" | "<=>" | "<" | "<=" | ">" | ">=" =>
      p.children().length == 2 &&
        fieldIndex(p.children()(0), schema).isDefined &&
        literal(p.children()(1)).isDefined
    case "IN" =>
      p.children().length >= 2 &&
        fieldIndex(p.children()(0), schema).isDefined &&
        p.children().tail.forall(literal(_).isDefined)
    case "IS_NULL" | "IS_NOT_NULL" =>
      p.children().length == 1 &&
        fieldIndex(p.children()(0), schema).isDefined
    case "ALWAYS_TRUE" | "ALWAYS_FALSE" => true
    case _ => false
  }

  def eval(p: Predicate, row: Row, schema: StructType): Boolean = {
    def colVal = fieldIndex(p.children()(0), schema).map(row.get).orNull
    p.name() match {
      case "AND" => p.children().forall(
        c => eval(c.asInstanceOf[Predicate], row, schema))
      case "OR" => p.children().exists(
        c => eval(c.asInstanceOf[Predicate], row, schema))
      case "NOT" => !eval(p.children()(0).asInstanceOf[Predicate], row, schema)
      case "ALWAYS_TRUE" => true
      case "ALWAYS_FALSE" => false
      case "IS_NULL" => colVal == null
      case "IS_NOT_NULL" => colVal != null
      case "IN" =>
        val v = colVal
        v != null && p.children().tail.flatMap(literal).contains(v)
      case "<=>" =>
        val l = literal(p.children()(1)).orNull
        (colVal == null && l == null) || cmp(colVal, l).contains(0)
      case op @ ("=" | "<" | "<=" | ">" | ">=") =>
        cmp(colVal, literal(p.children()(1)).orNull).exists { c =>
          op match {
            case "=" => c == 0
            case "<" => c < 0
            case "<=" => c <= 0
            case ">" => c > 0
            case ">=" => c >= 0
          }
        }
      case _ => false // canDeleteWhere already rejected these
    }
  }
}
