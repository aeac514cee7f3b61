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
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, CompositeReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
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
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog {
  private var catalogName = "graft_cat"
  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catalogName = name
  override def name(): String = catalogName

  private def key(ident: Identifier): String =
    (ident.namespace :+ ident.name).mkString(".")

  /** Opt in to ANSI table constraints (`CREATE TABLE … CHECK (…)
    * ENFORCED`, `ALTER TABLE … ADD/DROP CONSTRAINT`) and COLUMN
    * DEFAULT VALUES (`v DOUBLE DEFAULT 1.5`, the `DEFAULT` keyword in
    * INSERT, `ALTER COLUMN … SET DEFAULT`) — without these
    * capabilities Spark rejects the DDL against the catalog up front.
    * Defaults need no connector-side evaluation: Spark records them
    * in the column metadata (CURRENT_DEFAULT / EXISTS_DEFAULT) and
    * the analyzer substitutes them into writes, so the connector only
    * has to carry the metadata through its schema.
    */
  override def capabilities()
      : java.util.Set[TableCatalogCapability] =
    java.util.EnumSet.of(TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  /** The TableInfo overload is the path `CREATE TABLE` with
    * constraints arrives on — capture them on the memtable so Spark's
    * write planning sees them (it compiles ENFORCED CHECKs into
    * CheckInvariant guards over every INSERT/MERGE/UPDATE).
    */
  override def createTable(ident: Identifier, info: TableInfo): Table = {
    val t = createTable(ident, info.schema(), info.partitions(),
        info.properties())
      .asInstanceOf[GraftMemTable]
    t.setConstraints(info.constraints().toIndexedSeq)
    t
  }

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
    // identity partitioning only (PARTITIONED BY (col)): the memtable
    // has no files, so bucket/temporal transforms would promise a
    // layout it cannot deliver — fail the DDL up front instead
    val partCols = partitions.toSeq.map { t =>
      val refs = t.references()
      if (t.name() == "identity" && refs.length == 1 &&
          refs(0).fieldNames().length == 1) refs(0).fieldNames().head
      else throw new UnsupportedOperationException(
        s"unsupported partition transform: $t (identity only)")
    }
    val t = new GraftMemTable(key(ident), schema, partCols,
      Option(properties).map(_.asScala.toMap).getOrElse(Map.empty))
    if (GraftCatalog.tables.putIfAbsent(key(ident), t) != null)
      throw new TableAlreadyExistsException(ident)
    t
  }

  /** SCHEMA EVOLUTION: `ALTER TABLE … ADD/RENAME/DROP COLUMN` routes
    * here as `TableChange`s. Snapshot-consistent semantics: the
    * change commits a NEW version carrying the new schema (rows
    * conformed — added columns null-fill, dropped columns project
    * away); every PRIOR version keeps its own schema and rows, so
    * `VERSION AS OF` reads of pre-ALTER snapshots still serve the
    * pre-ALTER shape. Mirrors the parquet `schema_evolution` read
    * path, where old files null-fill under a widened schema.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = loadTable(ident) match {
      case m: GraftMemTable => m
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE unsupported for ${other.name()}")
    }
    t.applyChanges(changes)
    t
  }

  override def dropTable(ident: Identifier): Boolean =
    GraftCatalog.tables.remove(key(ident)) != null

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val t = Option(GraftCatalog.tables.remove(key(oldIdent)))
      .getOrElse(throw new NoSuchTableException(oldIdent))
    if (GraftCatalog.tables.putIfAbsent(key(newIdent),
        t.renamed(key(newIdent))) != null)
      throw new TableAlreadyExistsException(newIdent)
  }

  // -- FunctionCatalog: catalog-resolved SQL functions
  // (`SELECT graft_cat.ns.gcd(a, b)`) — the connector-ships-compute
  // quadrant; the set lives in [[GraftFunctions]]
  override def listFunctions(namespace: Array[String])
      : Array[Identifier] =
    if (namespaceExists(namespace))
      GraftFunctions.names.map(n => Identifier.of(namespace, n)).toArray
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    GraftFunctions.load(ident.name).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident))

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

  private def memTable(fullName: String): GraftMemTable =
    Option(tables.get(fullName)).getOrElse(
      throw new NoSuchElementException(s"no catalog table $fullName"))

  /** Commit-log listing for `ns.table` — (version, commit µs,
    * row count | -1 if expired, expired flag). The DESCRIBE HISTORY
    * surface (an API, not SQL: Spark has no HISTORY statement for
    * third-party catalogs).
    */
  def history(fullName: String): Seq[(Int, Long, Long, Boolean)] =
    memTable(fullName).historyList

  /** VACUUM: expire all but the last `keepLast` snapshots of
    * `ns.table`. Returns how many this call expired.
    */
  def expireSnapshots(fullName: String, keepLast: Int): Int =
    memTable(fullName).expireSnapshots(keepLast)

  /** Current committed version of `ns.table` — the base a
    * transactional replace should capture before it reads.
    */
  def currentVersion(fullName: String): Int =
    memTable(fullName).currentVersion

  /** Transactional whole-table replace: commit `rows` as the new
    * table contents ONLY IF the table is still at `baseVersion` —
    * the optimistic-concurrency verb behind OVERWRITE and the
    * copy-on-write rewrites (see
    * `GraftMemTable.publishReplaceIfBase`). Throws
    * `ConcurrentModificationException` on a moved base; the caller
    * re-reads and retries.
    */
  def overwriteIfBase(fullName: String, rows: Seq[Row],
      baseVersion: Int): Unit =
    memTable(fullName).publishReplaceIfBase(rows, baseVersion)

  /** Op counts (deletes, updates, inserts) of the last DELTA commit
    * on `ns.table` — evidence that merge-on-read shipped only changed
    * rows.
    */
  def lastDeltaOps(fullName: String): (Long, Long, Long) =
    memTable(fullName).lastDeltaOps

  /** RESTORE `ns.table` TO VERSION AS OF `version` — commits a new
    * snapshot whose rows and schema are those of `version` (history is
    * append-only; see `GraftMemTable.restoreVersion`). An API verb,
    * not SQL: Spark has no RESTORE statement for third-party catalogs.
    */
  def restore(fullName: String, version: Int): Unit =
    memTable(fullName).restoreVersion(version)

  /** CHANGE DATA FEED over `(fromV, toV]` — the per-commit row-level
    * diff (Delta `table_changes` semantics without row tracking):
    * every DML verb reduces to `insert`/`delete` rows tagged with
    * their commit version, an UPDATE appearing as its delete+insert
    * pair. Returns (commitVersion, changeType, row) triples plus the
    * era's schema; see `GraftMemTable.changesBetween` for the
    * multiset-diff contract.
    */
  def changeFeed(fullName: String, fromV: Int, toV: Int)
      : (Seq[(Int, String, Row)], org.apache.spark.sql.types.StructType) =
    memTable(fullName).changesBetween(fromV, toV)

  /** Shallow CLONE: create `dstFullName` whose v1 snapshot IS the
    * current snapshot of `srcFullName` (zero-copy — the immutable row
    * seq is shared by reference, the memtable analogue of a clone
    * referencing the source's data files). The clone starts its own
    * history (v0 empty, v1 = cloned state); subsequent writes to
    * either table never touch the other. Fails if the destination
    * already exists or the source does not.
    */
  def cloneTable(srcFullName: String, dstFullName: String): Unit = {
    val (rows, schemaAt, partCols, props, cons) =
      memTable(srcFullName).cloneState
    val dst = new GraftMemTable(dstFullName, schemaAt, partCols, props)
    // constraints are table metadata like the schema: a clone of an
    // ENFORCED-CHECK table must keep enforcing (renamed() already
    // copies them; CLONE must match)
    dst.setConstraints(cons)
    if (tables.putIfAbsent(dstFullName, dst) != null)
      throw new IllegalArgumentException(
        s"catalog table $dstFullName already exists")
    dst.publish(rows, replace = false)
  }
}

/** A catalog-managed driver-memory table: batch read, two-phase-commit
  * batch write (append + truncate-backed overwrite), filter-based
  * row-level DELETE, and group-based row-level operations (SQL
  * `MERGE INTO` / `UPDATE` rewrites). Row payloads live behind a
  * lock; scans snapshot.
  */
final class GraftMemTable(fullName: String, schema0: StructType,
    partCols: Seq[String] = Nil,
    props: Map[String, String] = Map.empty)
    extends Table with SupportsRead with SupportsWrite with SupportsDeleteV2
    with SupportsRowLevelOperations with SupportsPartitionManagement {
  require(partCols.forall(c => schema0.fieldNames.contains(c)),
    s"partition columns $partCols must exist in the schema")

  private val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
  /** Columns declared (via TBLPROPERTIES 'delta.key') to uniquely
    * identify rows — present ⇒ row-level operations run in DELTA
    * (merge-on-read) mode instead of group-based copy-on-write.
    * Protected from ALTER rename/drop like partition columns.
    */
  private[catalog] val deltaKeyCols: Seq[String] =
    props.get("delta.key").map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Nil)
  require(deltaKeyCols.forall(schema0.fieldNames.contains),
    s"delta.key columns $deltaKeyCols must exist in the schema")

  /** The table schema with delta-key fields pinned NON-NULLABLE —
    * declaring a row id asserts the unique-id contract, and Spark's
    * row-level rewrites require non-nullable row-id attributes.
    */
  private def pinDeltaKeys(st: StructType): StructType =
    if (deltaKeyCols.isEmpty) st
    else StructType(st.map(f =>
      if (deltaKeyCols.contains(f.name)) f.copy(nullable = false)
      else f))

  /** Current schema; starts at the creation schema and advances only
    * via [[applyChanges]] (ALTER TABLE).
    */
  private var curSchema: StructType = pinDeltaKeys(schema0)
  /** ANSI table constraints (CHECK …). Reporting them from
    * [[constraints]] is what makes Spark ENFORCE them: write planning
    * compiles every enforced CHECK into a CheckInvariant guard over
    * the incoming rows, failing the whole statement before commit —
    * the table never sees a violating snapshot.
    */
  private var tableConstraints
      : Seq[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    Nil
  private[catalog] def setConstraints(
      cs: Seq[org.apache.spark.sql.connector.catalog.constraints.Constraint])
      : Unit = synchronized { tableConstraints = cs }
  override def constraints()
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    synchronized(tableConstraints.toArray)
  /** Immutable row-set per committed version; v0 = the empty table at
    * creation. Every commit (INSERT/CTAS/OVERWRITE), DELETE,
    * TRUNCATE, and ALTER appends one snapshot — the Iceberg-style
    * history that `VERSION AS OF` serves. Driver-memory table ⇒
    * snapshots are cheap Seq references (rows are immutable).
    */
  private val history =
    scala.collection.mutable.ArrayBuffer[Seq[Row]](Seq.empty)
  /** Schema per committed version, parallel to [[history]] — old
    * snapshots keep the schema they were committed under, so time
    * travel across an ALTER serves each era in its own shape.
    */
  private val schemaHistory =
    scala.collection.mutable.ArrayBuffer[StructType](pinDeltaKeys(schema0))
  /** Commit timestamps (µs), strictly increasing even when commits
    * land inside one clock tick — what `TIMESTAMP AS OF` binds to.
    */
  private val commitTsMicros =
    scala.collection.mutable.ArrayBuffer[Long](
      System.currentTimeMillis() * 1000L)
  private def record(): Unit = {
    history += buf.toSeq
    schemaHistory += curSchema
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
  private def snapshot(): (Seq[Row], StructType) =
    synchronized((buf.toSeq, curSchema))
  private[catalog] def currentVersion: Int = synchronized(history.size - 1)
  /** First version still readable; everything below was expired by
    * [[expireSnapshots]] (version NUMBERS never shift — an expired
    * read fails by id, it doesn't silently rebind).
    */
  private var expiredBelow = 0
  private[catalog] def versionRows(v: Int): (Seq[Row], StructType) =
    synchronized {
      if (v < 0 || v >= history.size)
        throw new IllegalArgumentException(
          s"no version $v of $fullName (latest: ${history.size - 1})")
      if (v < expiredBelow)
        throw new IllegalArgumentException(
          s"version $v of $fullName is expired " +
            s"(earliest retained: $expiredBelow)")
      (history(v), schemaHistory(v))
    }
  /** VACUUM semantics: retain the last `keepLast` versions, release
    * the rest (row seqs cleared — on a file-based catalog this is the
    * data-file delete; here it frees driver memory). Time travel to an
    * expired version fails by id; the CURRENT table is never affected.
    * Returns the number of versions expired by this call.
    */
  private[catalog] def expireSnapshots(keepLast: Int): Int = synchronized {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val cut = math.max(0, history.size - keepLast)
    val n = math.max(0, cut - expiredBelow)
    (expiredBelow until cut).foreach(v => history(v) = Seq.empty)
    expiredBelow = math.max(expiredBelow, cut)
    n
  }
  /** Commit log listing: (version, commit µs, row count | -1 if
    * expired, expired flag) — the DESCRIBE HISTORY surface.
    */
  private[catalog] def historyList: Seq[(Int, Long, Long, Boolean)] =
    synchronized {
      history.indices.map { v =>
        val exp = v < expiredBelow
        (v, commitTsMicros(v),
          if (exp) -1L else history(v).size.toLong, exp)
      }.toSeq
    }
  private[catalog] def publish(rows: Seq[Row], replace: Boolean): Unit =
    synchronized {
      if (replace) buf.clear()
      buf ++= rows
      record()
    }

  /** OPTIMISTIC CONCURRENCY for replace commits: publish `rows` as
    * the whole table ONLY IF no other commit landed since
    * `baseVersion` (the version the replacing transaction read its
    * snapshot at). Blind APPENDs never conflict — they commute, the
    * Delta ConcurrentAppend allowance — but a replace (OVERWRITE, or
    * a copy-on-write MERGE/UPDATE/DELETE rewrite) that committed over
    * a moved base would silently erase the interleaved writer's rows,
    * so it fails with a snapshot-conflict instead and the caller
    * retries against the new base. Nothing is mutated on conflict.
    */
  private[catalog] def publishReplaceIfBase(rows: Seq[Row],
      baseVersion: Int): Unit = synchronized {
    if (currentVersion != baseVersion)
      throw new java.util.ConcurrentModificationException(
        s"snapshot conflict on $fullName: replace based on version " +
          s"$baseVersion but current is $currentVersion — " +
          "retry against the new base")
    publish(rows, replace = true)
  }

  /** RESTORE TO VERSION v (Delta `RESTORE TABLE` semantics): rebind
    * the CURRENT table state — rows AND schema — to snapshot `v` by
    * committing a NEW version. History is append-only: the restore is
    * itself a commit, versions after `v` stay readable (time travel
    * "forward" across a restore works), and nothing is rewritten.
    * Restoring across an ALTER brings the old schema back as the
    * current schema. Fails up front on an expired or out-of-range
    * version with nothing mutated.
    */
  private[catalog] def restoreVersion(v: Int): Unit = synchronized {
    val (rows, schemaAt) = versionRows(v)
    buf.clear()
    buf ++= rows
    curSchema = schemaAt
    record()
  }

  /** Zero-copy snapshot of current (rows, schema, partition columns)
    * for CLONE — rows are immutable, so handing the Seq reference to
    * the clone is the memtable analogue of a shallow clone's
    * file-reference copy (no data is rewritten).
    */
  private[catalog] def cloneState
      : (Seq[Row], StructType, Seq[String], Map[String, String],
         Seq[org.apache.spark.sql.connector.catalog.constraints.Constraint]) =
    synchronized((buf.toSeq, curSchema, partCols, props, tableConstraints))

  /** Rows APPENDED by commit `v` over `v−1` — defined only for
    * append-only commits: the previous snapshot must be a PREFIX (by
    * reference — snapshots share row objects) of the new one, which
    * every plain INSERT satisfies and every replace commit
    * (OVERWRITE / DELETE / ALTER / row-level rewrite) does not. The
    * streaming source fails loudly on the latter: streaming a table
    * requires append-only history (Delta\'s contract); DML streams
    * belong to [[changesBetween]].
    */
  private[catalog] def appendedBetween(fromV: Int, toV: Int): Seq[Row] =
    synchronized {
      (fromV + 1 to toV).flatMap { v =>
        val (prev, _) = versionRows(v - 1)
        val (cur, schV) = versionRows(v)
        require(schV == curSchema,
          s"streaming read across a schema change is unsupported " +
            s"(version $v of $fullName)")
        val isAppend = cur.length >= prev.length &&
          prev.indices.forall(i =>
            cur(i).asInstanceOf[AnyRef] eq prev(i).asInstanceOf[AnyRef])
        require(isAppend,
          s"streaming read requires append-only commits; version $v " +
            s"of $fullName replaced rows (use the change feed for DML)")
        cur.drop(prev.length)
      }
    }

  /** Row count appended by commit `v` (admission control sizing);
    * exact only for append-only commits, which is all the streaming
    * source ever reads.
    */
  private[catalog] def appendedCount(v: Int): Long = synchronized {
    val (prev, _) = versionRows(v - 1)
    val (cur, _) = versionRows(v)
    math.max(0, cur.length - prev.length).toLong
  }

  /** CHANGE DATA FEED: the row-level diff between consecutive
    * snapshots over `(fromV, toV]`, reconstructed from the immutable
    * history by MULTISET difference — rows present more times in v
    * than v−1 emit `insert` (per extra occurrence), fewer emit
    * `delete`. Because every DML verb (INSERT / DELETE / OVERWRITE /
    * MERGE / UPDATE / TRUNCATE / RESTORE) commits a snapshot, they
    * all reduce to the same uniform feed an incremental consumer
    * tails; an UPDATE appears as its delete+insert pair (standard CDF
    * without row tracking), and a copy-on-write rewrite's untouched
    * rows cancel in the diff — only real changes surface. Requires a
    * schema-constant range (diffing across an ALTER is ill-defined
    * row-wise) and fails on expired versions; a file-format catalog
    * would read per-commit change files instead of diffing, same
    * output contract.
    */
  private[catalog] def changesBetween(fromV: Int, toV: Int)
      : (Seq[(Int, String, Row)], StructType) = synchronized {
    require(fromV >= 0 && fromV < toV && toV <= currentVersion,
      s"bad change-feed range ($fromV, $toV] for $fullName " +
        s"(latest: $currentVersion)")
    val (_, schema0At) = versionRows(fromV)
    val out = Seq.newBuilder[(Int, String, Row)]
    (fromV + 1 to toV).foreach { v =>
      val (prev, _) = versionRows(v - 1)
      val (cur, schV) = versionRows(v)
      require(schV == schema0At,
        s"change feed across a schema change is unsupported " +
          s"(version $v of $fullName)")
      val prevCounts = prev.groupBy(identity).map { case (r, rs) =>
        r -> rs.size
      }
      val curCounts = cur.groupBy(identity).map { case (r, rs) =>
        r -> rs.size
      }
      (prevCounts.keySet ++ curCounts.keySet).foreach { r =>
        val delta = curCounts.getOrElse(r, 0) - prevCounts.getOrElse(r, 0)
        if (delta > 0) (1 to delta).foreach(_ => out += ((v, "insert", r)))
        else if (delta < 0)
          (1 to -delta).foreach(_ => out += ((v, "delete", r)))
      }
    }
    (out.result(), schema0At)
  }

  /** Apply ALTER TABLE changes: ADD COLUMN (appended, existing rows
    * null-fill), RENAME COLUMN (positional values untouched), DROP
    * COLUMN (values projected away). All changes in the statement
    * apply atomically, then ONE new version commits with the new
    * schema — prior snapshots are untouched. Unsupported change kinds
    * (type updates, positioned adds, nested fields) fail the statement
    * up front with nothing mutated: changes are staged on copies and
    * only installed after every change validated.
    */
  private[catalog] def applyChanges(changes: Seq[TableChange]): Unit =
    synchronized {
      var fields = curSchema.fields.toVector
      var rows = buf.toVector
      var cons = tableConstraints
      changes.foreach {
        case add: TableChange.AddConstraint =>
          val c = add.constraint()
          if (cons.exists(_.name().equalsIgnoreCase(c.name())))
            throw new IllegalArgumentException(
              s"constraint ${c.name()} already exists on $fullName")
          cons :+= c
        case drop: TableChange.DropConstraint =>
          val i = cons.indexWhere(_.name().equalsIgnoreCase(drop.name()))
          if (i < 0) {
            if (!drop.ifExists())
              throw new IllegalArgumentException(
                s"no constraint ${drop.name()} on $fullName")
          } else cons = cons.patch(i, Nil, 1)
        case add: TableChange.AddColumn =>
          if (add.fieldNames().length != 1)
            throw new UnsupportedOperationException(
              s"nested ADD COLUMN unsupported: ${add.fieldNames().mkString(".")}")
          if (add.position() != null)
            throw new UnsupportedOperationException(
              "positioned ADD COLUMN unsupported (columns append)")
          val nm = add.fieldNames().head
          if (fields.exists(_.name == nm))
            throw new IllegalArgumentException(s"column $nm already exists")
          fields :+= org.apache.spark.sql.types
            .StructField(nm, add.dataType(), nullable = true)
          rows = rows.map(r => Row.fromSeq(r.toSeq :+ null))
        case ren: TableChange.RenameColumn
            if partCols.contains(ren.fieldNames().mkString(".")) =>
          throw new UnsupportedOperationException(
            s"cannot rename partition column ${ren.fieldNames().head}")
        case ren: TableChange.RenameColumn
            if deltaKeyCols.contains(ren.fieldNames().mkString(".")) =>
          throw new UnsupportedOperationException(
            s"cannot rename delta.key column ${ren.fieldNames().head}")
        case ren: TableChange.RenameColumn =>
          if (ren.fieldNames().length != 1)
            throw new UnsupportedOperationException(
              s"nested RENAME COLUMN unsupported: ${ren.fieldNames().mkString(".")}")
          val i = fields.indexWhere(_.name == ren.fieldNames().head)
          if (i < 0) throw new IllegalArgumentException(
            s"no column ${ren.fieldNames().head} in $fullName")
          fields = fields.updated(i, fields(i).copy(name = ren.newName()))
        case del: TableChange.DeleteColumn
            if partCols.contains(del.fieldNames().mkString(".")) =>
          throw new UnsupportedOperationException(
            s"cannot drop partition column ${del.fieldNames().head}")
        case del: TableChange.DeleteColumn
            if deltaKeyCols.contains(del.fieldNames().mkString(".")) =>
          throw new UnsupportedOperationException(
            s"cannot drop delta.key column ${del.fieldNames().head}")
        case del: TableChange.DeleteColumn =>
          if (del.fieldNames().length != 1)
            throw new UnsupportedOperationException(
              s"nested DROP COLUMN unsupported: ${del.fieldNames().mkString(".")}")
          val i = fields.indexWhere(_.name == del.fieldNames().head)
          if (i < 0) {
            if (!del.ifExists()) throw new IllegalArgumentException(
              s"no column ${del.fieldNames().head} in $fullName")
          } else {
            fields = fields.patch(i, Nil, 1)
            rows = rows.map(r => Row.fromSeq(
              r.toSeq.patch(i, Nil, 1)))
          }
        case upd: TableChange.UpdateColumnType
            if partCols.contains(upd.fieldNames().mkString(".")) =>
          throw new UnsupportedOperationException(
            s"cannot change the type of partition column " +
              upd.fieldNames().head)
        case upd: TableChange.UpdateColumnType =>
          // WIDENING promotions only (Iceberg type-promotion rules):
          // values re-box losslessly, so old snapshots can keep their
          // narrow schema while the current era widens — a narrowing
          // or cross-family cast would corrupt data and fails up front
          if (upd.fieldNames().length != 1)
            throw new UnsupportedOperationException(
              s"nested ALTER COLUMN TYPE unsupported: " +
                upd.fieldNames().mkString("."))
          val i = fields.indexWhere(_.name == upd.fieldNames().head)
          if (i < 0) throw new IllegalArgumentException(
            s"no column ${upd.fieldNames().head} in $fullName")
          import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType}
          val widen: Any => Any =
            (fields(i).dataType, upd.newDataType()) match {
              case (IntegerType, LongType) =>
                v => if (v == null) null else v.asInstanceOf[Int].toLong
              case (FloatType, DoubleType) =>
                v => if (v == null) null
                  else v.asInstanceOf[Float].toDouble
              case (from, to) =>
                throw new UnsupportedOperationException(
                  s"only widening promotions supported " +
                    s"(int->bigint, float->double): $from -> $to")
            }
          rows = rows.map(r =>
            Row.fromSeq(r.toSeq.updated(i, widen(r.get(i)))))
          fields = fields.updated(i,
            fields(i).copy(dataType = upd.newDataType()))
        case upd: TableChange.UpdateColumnDefaultValue =>
          // ALTER COLUMN … SET/DROP DEFAULT: the default lives in the
          // column metadata (CURRENT_DEFAULT — what the analyzer
          // substitutes into FUTURE writes); existing rows are
          // materialized, so no EXISTS_DEFAULT rewrite applies
          if (upd.fieldNames().length != 1)
            throw new UnsupportedOperationException(
              s"nested ALTER COLUMN DEFAULT unsupported: " +
                upd.fieldNames().mkString("."))
          val i = fields.indexWhere(_.name == upd.fieldNames().head)
          if (i < 0) throw new IllegalArgumentException(
            s"no column ${upd.fieldNames().head} in $fullName")
          val f = fields(i)
          val mb = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
          val sqlTxt =
            Option(upd.newCurrentDefault()).map(_.getSql).orNull
          if (sqlTxt == null || sqlTxt.isEmpty)
            mb.remove("CURRENT_DEFAULT"): Unit
          else mb.putString("CURRENT_DEFAULT", sqlTxt): Unit
          fields = fields.updated(i, f.copy(metadata = mb.build()))
        case other =>
          throw new UnsupportedOperationException(
            s"unsupported table change: $other")
      }
      curSchema = StructType(fields)
      tableConstraints = cons
      buf.clear()
      buf ++= rows
      record()
    }

  private[catalog] def renamed(newName: String): GraftMemTable = {
    val t = new GraftMemTable(newName, schema0, partCols, props)
    synchronized {
      t.curSchema = curSchema
      t.tableConstraints = tableConstraints
      t.buf ++= buf
      t.history.clear()
      t.history ++= history
      t.schemaHistory.clear()
      t.schemaHistory ++= schemaHistory
      t.commitTsMicros.clear()
      t.commitTsMicros ++= commitTsMicros
      t.expiredBelow = expiredBelow
    }
    t
  }

  /** Read-only view of this table pinned at `version` — what
    * `SELECT … FROM t VERSION AS OF v` resolves to.
    */
  private[catalog] def pinnedAt(version: Int): Table = {
    // validate eagerly: bad version fails the query up front; the
    // snapshot carries ITS OWN schema — reads across an ALTER serve
    // each era in the shape it was committed under
    val (rows, schemaAt) = versionRows(version)
    val pinnedV = version
    val outer = this
    new Table with SupportsRead {
      override def name(): String = s"${outer.name()}@v$pinnedV"
      override def schema(): StructType = schemaAt
      override def capabilities(): java.util.Set[TableCapability] =
        java.util.EnumSet.of(TableCapability.BATCH_READ)
      override def newScanBuilder(
          options: CaseInsensitiveStringMap): ScanBuilder =
        outer.scanBuilderFor(rows, schemaAt)
    }
  }

  override def name(): String = s"graft_cat_table($fullName)"
  override def properties(): java.util.Map[String, String] =
    props.asJava
  override def schema(): StructType = synchronized(curSchema)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.MICRO_BATCH_READ)

  // ------------------------------------------------------------- read
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val (rows, schemaAt) = snapshot()
    scanBuilderFor(rows, schemaAt,
      Option(options.get("maxRowsPerBatch")).map(_.toLong).getOrElse(0L))
  }

  /** PARTITION-PRUNED scan builder: on a partitioned table, predicates
    * referencing only partition columns push down
    * (`SupportsPushDownV2Filters`) and are FULLY handled — every row
    * of a partition shares its partition values, so partition-level
    * evaluation is row-exact and Spark plans no residual filter for
    * them. `planInputPartitions` emits one InputPartition per
    * surviving partition value (sorted for stable planning), so a
    * pruned partition ships zero rows — the memtable analogue of
    * directory pruning, pinned in GraftCatalogSpec via the planned
    * partition count.
    */
  private[catalog] def scanBuilderFor(rowsAt: Seq[Row],
      schemaAt: StructType, maxRowsPerBatch: Long = 0L): ScanBuilder =
    new ScanBuilder with SupportsPushDownV2Filters {
      private var pushed: Array[Predicate] = Array.empty
      private val partIdx = partCols.map(c => schemaAt.fieldNames.indexOf(c))
      private def partOnly(pr: Predicate): Boolean =
        partCols.nonEmpty &&
          PredicateEval.supported(pr, schemaAt) &&
          PredicateEval.references(pr).forall(partCols.contains)
      override def pushPredicates(
          predicates: Array[Predicate]): Array[Predicate] = {
        val (take, rest) = predicates.partition(partOnly)
        pushed = take
        rest
      }
      override def pushedPredicates(): Array[Predicate] = pushed
      override def build(): Scan = new Scan with Batch
          with SupportsReportStatistics {
        private val parts: Seq[Seq[Row]] =
          if (partCols.isEmpty || partIdx.exists(_ < 0)) Seq(rowsAt)
          else rowsAt
            .groupBy(r => partIdx.map(i => r.get(i)).toList)
            .toSeq
            .sortBy { case (k, _) => k.mkString("\u0000") }
            .collect {
              case (_, rs) if pushed.forall(pr =>
                PredicateEval.eval(pr, rs.head, schemaAt)) => rs.toSeq
            }
        private val rows = rowsAt
        override def readSchema(): StructType = schemaAt
        override def description(): String =
          s"graft-cat-scan $fullName rows=${rows.length} " +
            s"parts=${parts.length} pushed=[${pushed.mkString(",")}]"
        override def toBatch: Batch = this
        /** HONEST post-pruning statistics — what lets the planner
          * AUTO-BROADCAST a small catalog dimension in a join with no
          * hint (the same contract SynthSource honors): numRows is
          * the exact surviving row count, sizeInBytes a schema-width
          * estimate. Without this Spark assumes "unknown = huge" and
          * plans a shuffle join for a 25-row dim table.
          */
        override def estimateStatistics(): Statistics = {
          val n = parts.map(_.length.toLong).sum
          new Statistics {
            override def sizeInBytes(): java.util.OptionalLong =
              java.util.OptionalLong.of(
                math.max(n * math.max(schemaAt.defaultSize, 1), 1L))
            override def numRows(): java.util.OptionalLong =
              java.util.OptionalLong.of(n)
          }
        }
        override def planInputPartitions(): Array[InputPartition] =
          parts.map(rs => CatRows.of(rs, schemaAt)).toArray
        override def createReaderFactory(): PartitionReaderFactory =
          new CatReaderFactory
        /** STREAMING READ of the catalog table — the Delta-source
          * shape: offsets are COMMIT VERSIONS, each micro-batch ships
          * the rows appended by a commit range, and replace commits
          * (OVERWRITE/DELETE/ALTER rewrites) fail the stream with a
          * pointer at the change feed — streaming a table requires
          * append-only history, exactly Delta's contract without
          * ignoreChanges.
          */
        override def toMicroBatchStream(
            checkpointLocation: String): MicroBatchStream =
          new CatMicroBatchStream(GraftMemTable.this, schemaAt,
            maxRowsPerBatch)
      }
    }

  // ---------------------------------------------- partition surface
  override def partitioning(): Array[Transform] =
    partCols.map(c => org.apache.spark.sql.connector.expressions
      .Expressions.identity(c)).toArray

  override def partitionSchema(): StructType =
    StructType(partCols.map(c => synchronized(curSchema)(c)))

  /** Explicitly-registered (possibly empty) partitions, alongside the
    * implicit ones the data defines — `ALTER TABLE ADD PARTITION`
    * registers here, data-defined partitions appear without it.
    */
  private val registeredParts =
    scala.collection.mutable.LinkedHashSet.empty[Seq[Any]]

  private def partValuesOf(r: Row): Seq[Any] = {
    val sch = synchronized(curSchema)
    val idx = partCols.map(c => sch.fieldNames.indexOf(c))
    idx.map(i => r.get(i))
  }
  private def externalValues(ident: InternalRow): Seq[Any] = {
    val ps = partitionSchema()
    ps.fields.indices.map { i =>
      org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToScala(ident.get(i, ps.fields(i).dataType),
          ps.fields(i).dataType)
    }
  }
  private def internalRowOf(values: Seq[Any]): InternalRow = {
    val ps = partitionSchema()
    InternalRow.fromSeq(values.zipWithIndex.map { case (v, i) =>
      org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToCatalyst(v) match {
        case x => x
      }
    })
  }

  override def createPartition(ident: InternalRow,
      properties: java.util.Map[String, String]): Unit = synchronized {
    val vals = externalValues(ident)
    if (registeredParts.contains(vals) ||
        buf.exists(r => partValuesOf(r) == vals))
      throw new org.apache.spark.sql.catalyst.analysis
        .PartitionsAlreadyExistException(fullName, ident,
          partitionSchema())
    registeredParts += vals: Unit
  }

  /** Drop = delete the partition's rows (a commit) + unregister. */
  override def dropPartition(ident: InternalRow): Boolean = synchronized {
    val vals = externalValues(ident)
    val had = registeredParts.remove(vals)
    val keep = buf.filterNot(r => partValuesOf(r) == vals)
    val changed = keep.length != buf.length
    if (changed) {
      buf.clear()
      buf ++= keep
      record()
    }
    had || changed
  }

  override def replacePartitionMetadata(ident: InternalRow,
      properties: java.util.Map[String, String]): Unit = ()
  override def loadPartitionMetadata(ident: InternalRow)
      : java.util.Map[String, String] =
    java.util.Collections.emptyMap()

  override def listPartitionIdentifiers(names: Array[String],
      ident: InternalRow): Array[InternalRow] = synchronized {
    val ps = partitionSchema()
    val nameIdx = names.map(n => ps.fieldNames.indexOf(n))
    require(nameIdx.forall(_ >= 0),
      s"unknown partition columns ${names.mkString(",")}")
    val wanted = names.indices.map(i =>
      org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToScala(ident.get(i, ps.fields(nameIdx(i)).dataType),
          ps.fields(nameIdx(i)).dataType))
    val all = (buf.map(partValuesOf).toSeq ++ registeredParts.toSeq)
      .distinct.sortBy(_.mkString("\u0000"))
    all.filter(vals => nameIdx.indices.forall(i =>
        vals(nameIdx(i)) == wanted(i)))
      .map(internalRowOf).toArray
  }

  // ------------------------------------------------------------ write
  /** Partitioned tables additionally DEMAND a write distribution
    * (`RequiresDistributionAndOrdering`): rows cluster by the
    * partition columns before the write, so each task holds whole
    * partitions — on a file-based format this is what keeps a
    * partitioned insert from writing tasks×partitions small files
    * (the planner inserts the hash Exchange; spec-pinned on the
    * INSERT plan). Unpartitioned tables leave it unspecified.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      // the version this write's transaction is based on — replace
      // commits are rejected if another commit lands after this point
      // (appends always commute; see publishReplaceIfBase)
      private val baseVersion = currentVersion
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new Write
          with RequiresDistributionAndOrdering {
        override def requiredDistribution()
            : org.apache.spark.sql.connector.distributions.Distribution =
          if (partCols.isEmpty)
            org.apache.spark.sql.connector.distributions.Distributions
              .unspecified()
          else org.apache.spark.sql.connector.distributions.Distributions
            .clustered(partCols.map(c =>
              org.apache.spark.sql.connector.expressions.Expressions
                .identity(c): org.apache.spark.sql.connector.expressions
                .Expression).toArray)
        override def requiredOrdering()
            : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          Array.empty
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(
              info2: PhysicalWriteInfo): DataWriterFactory =
            new graft.sources.synth.MemWriterFactory(info.schema())
          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            val rows = messages
              .map(_.asInstanceOf[graft.sources.synth.MemRows])
              .sortBy(_.partitionId).flatMap(_.rows).toSeq
            if (replace) publishReplaceIfBase(rows, baseVersion)
            else publish(rows, replace = false)
          }
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
    predicates.forall(p => PredicateEval.supported(p, schema()))
  override def deleteWhere(predicates: Array[Predicate]): Unit =
    synchronized {
      val keep = buf.filterNot(r =>
        predicates.forall(p => PredicateEval.eval(p, r, curSchema)))
      buf.clear()
      buf ++= keep
      record()
    }
  override def truncateTable(): Boolean = {
    synchronized { buf.clear(); record() }
    true
  }

  // ------------------------------------------- row-level ops (MERGE)
  /** GROUP-BASED (copy-on-write) row-level operations — the DSv2
    * contract SQL `MERGE INTO` / `UPDATE` rewrite to
    * (`RewriteMergeIntoTable`): Spark reads the target through the
    * operation's scan, computes the surviving row set (carried-over +
    * updated + inserted; multiple-match cardinality check included in
    * the rewritten plan), and writes it back through the operation's
    * write, REPLACING the scanned groups. This driver-memory table
    * has one group — the whole table — so the replacing commit is a
    * truncate-and-publish: exactly how a file-based lakehouse format
    * rewrites whole files under copy-on-write, collapsed to one
    * buffer. Rewrites commit one new snapshot, so MERGE lands in the
    * time-travel history like any other DML.
    */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation =
        if (deltaKeyCols.nonEmpty) deltaRowLevelOp(info)
        else cowRowLevelOp(info)
    }

  /** DELTA (merge-on-read) row-level operations — the OTHER half of
    * the DSv2 row-level contract, active when the table declares a
    * unique row id (`TBLPROPERTIES ('delta.key'='k1,k2')`): instead
    * of the group-based rewrite that ships every scanned row back
    * through the writer, Spark plans `WriteDelta` and the writer
    * receives ONLY the changed rows, each tagged delete / update /
    * insert with its row-id projection — the Iceberg
    * merge-on-read shape, where carried rows never move. The commit
    * applies the ops keyed by the declared id under the same
    * base-version conflict check as every replace commit.
    */
  private def deltaRowLevelOp(info: RowLevelOperationInfo)
      : RowLevelOperation =
    new RowLevelOperation with SupportsDelta {
      private val baseVersion = currentVersion
      override def command(): RowLevelOperation.Command = info.command()
      override def description(): String =
        s"graft-cat-delta ${info.command()} $fullName"
      override def newScanBuilder(
          options: CaseInsensitiveStringMap): ScanBuilder = {
        val (rows, schemaAt) = snapshot()
        scanBuilderFor(rows, schemaAt)
      }
      override def rowId(): Array[NamedReference] =
        deltaKeyCols.map(c => org.apache.spark.sql.connector.expressions
          .Expressions.column(c)).toArray
      override def newWriteBuilder(
          winfo: LogicalWriteInfo): DeltaWriteBuilder =
        new DeltaWriteBuilder {
          override def build(): DeltaWrite = new DeltaWrite {
            override def toBatch(): DeltaBatchWrite = new DeltaBatchWrite {
              override def createBatchWriterFactory(
                  pinfo: PhysicalWriteInfo): DeltaWriterFactory =
                new DeltaMemWriterFactory(winfo.schema(),
                  StructType(deltaKeyCols.map(c =>
                    synchronized(curSchema)(c))))
              override def commit(
                  messages: Array[WriterCommitMessage]): Unit = {
                val ops = messages.map(_.asInstanceOf[DeltaOps])
                  .sortBy(_.partitionId)
                applyDelta(ops.flatMap(_.deletes).toSeq,
                  ops.flatMap(_.updates).toSeq,
                  ops.flatMap(_.inserts).toSeq, baseVersion)
              }
              override def abort(
                  messages: Array[WriterCommitMessage]): Unit = ()
            }
          }
        }
    }

  /** Op counts of the last delta commit — spec evidence that a
    * merge-on-read commit shipped only the CHANGED rows, not the
    * scanned group.
    */
  private[catalog] var lastDeltaOps: (Long, Long, Long) = (0L, 0L, 0L)

  /** Apply a delta commit: deletes and updates match existing rows by
    * the declared key, inserts append; one snapshot commits. Fails on
    * a moved base (same optimistic-concurrency rule as any replace).
    */
  private[catalog] def applyDelta(deletes: Seq[Seq[Any]],
      updates: Seq[(Seq[Any], Row)], inserts: Seq[Row],
      baseVersion: Int): Unit = synchronized {
    if (currentVersion != baseVersion)
      throw new java.util.ConcurrentModificationException(
        s"snapshot conflict on $fullName: delta based on version " +
          s"$baseVersion but current is $currentVersion")
    val ki = deltaKeyCols.map(curSchema.fieldIndex)
    def keyOf(r: Row): Seq[Any] = ki.map(r.get)
    val delSet = deletes.toSet
    val updMap = updates.toMap
    require(updMap.size == updates.size,
      s"duplicate row ids in delta update set on $fullName — " +
        "the declared delta.key is not unique")
    val next = buf.toVector.flatMap { r =>
      val k = keyOf(r)
      if (delSet.contains(k)) None
      else updMap.get(k).orElse(Some(r))
    }
    lastDeltaOps = (deletes.size.toLong, updates.size.toLong,
      inserts.size.toLong)
    buf.clear()
    buf ++= next
    buf ++= inserts
    record()
  }

  /** Group-based COPY-ON-WRITE row-level operations (the default when
    * no delta key is declared): Spark rewrites the statement to scan
    * the target and write every survivor back, replacing the group.
    */
  private def cowRowLevelOp(info: RowLevelOperationInfo)
      : RowLevelOperation = new RowLevelOperation {
        // the snapshot version this row-level rewrite reads — its
        // ReplaceData commit conflicts if any other commit interleaves
        private val baseVersion = currentVersion
        override def command(): RowLevelOperation.Command = info.command()
        override def description(): String =
          s"graft-cat-cow ${info.command()} $fullName"
        override def newScanBuilder(
            options: CaseInsensitiveStringMap): ScanBuilder = {
          val (rows, schemaAt) = snapshot()
          scanBuilderFor(rows, schemaAt)
        }
        override def newWriteBuilder(winfo: LogicalWriteInfo): WriteBuilder = {
          new WriteBuilder {
            override def build(): Write = new Write {
              override def toBatch: BatchWrite = new BatchWrite {
                override def createBatchWriterFactory(
                    pinfo: PhysicalWriteInfo): DataWriterFactory =
                  new CowWriterFactory(winfo.schema())
                override def commit(
                    messages: Array[WriterCommitMessage]): Unit =
                  publishReplaceIfBase(messages
                    .map(_.asInstanceOf[graft.sources.synth.MemRows])
                    .sortBy(_.partitionId).flatMap(_.rows).toSeq,
                    baseVersion)
                override def abort(
                    messages: Array[WriterCommitMessage]): Unit = ()
              }
            }
          }
        }
      }
}

/** Task-side reader over a [[CatRows]] partition — shared by the
  * batch scan and the streaming (commit-feed) scan.
  */
final class CatReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val cp = p.asInstanceOf[CatRows]
    new PartitionReader[InternalRow] {
      // serializer built task-side from the serializable schema
      private val ser = org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder(org.apache.spark.sql.catalyst.encoders
          .RowEncoder.encoderFor(cp.schema))
        .resolveAndBind().createSerializer()
      private val it = cp.rowIterator
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

/** Stream offset = committed version number of the catalog table. */
final case class CatOffset(version: Int) extends Offset {
  override def json(): String = version.toString
}

/** STREAMING source over a catalog table\'s commit log — the Delta
  * streaming-source shape: offsets are commit versions, each
  * micro-batch ships the rows APPENDED over a commit range
  * (`GraftMemTable.appendedBetween` — replace commits fail the
  * stream), and admission control honors max-rows limits by walking
  * whole commits until the budget is spent (a commit is the atomic
  * unit — it is never split across epochs, so each epoch is a
  * transactionally-consistent slice).
  */
final class CatMicroBatchStream(table: GraftMemTable,
    schemaAt: StructType, maxRowsPerBatch: Long = 0L)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  /** Set ONLY by [[prepareForTriggerAvailableNow]]: an AvailableNow
    * run must pin its end so the query drains and stops, but any other
    * trigger (ProcessingTime, Once) must keep following the live
    * commit log — capping those at stream-construction time would
    * silently drop every commit that lands after the stream starts.
    */
  private var availableNowEnd: Option[Int] = None
  private def endVersion: Int = availableNowEnd match {
    case Some(v) => math.min(v, table.currentVersion)
    case None => table.currentVersion
  }
  override def initialOffset(): Offset = CatOffset(0)
  override def deserializeOffset(json: String): Offset =
    CatOffset(json.trim.toInt)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s0 = start.asInstanceOf[CatOffset].version
    val end = endVersion
    def capOf(l: ReadLimit): Int = l match {
      case mr: ReadMaxRows =>
        // advance whole commits until the row budget is spent (but
        // always at least one commit, or the stream stalls)
        var v = s0; var budget = mr.maxRows()
        while (v < end && (v == s0 ||
            budget >= table.appendedCount(v + 1))) {
          v += 1
          budget -= table.appendedCount(v)
        }
        v
      case c: CompositeReadLimit => c.getReadLimits.map(capOf).min
      case _ => end
    }
    CatOffset(math.max(s0, capOf(limit)))
  }
  override def getDefaultReadLimit: ReadLimit =
    if (maxRowsPerBatch > 0) ReadLimit.maxRows(maxRowsPerBatch)
    else ReadLimit.allAvailable()
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(table.currentVersion)
  override def reportLatestOffset(): Offset = CatOffset(endVersion)
  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val (s0, e0) = (start.asInstanceOf[CatOffset].version,
      end.asInstanceOf[CatOffset].version)
    if (e0 <= s0) Array.empty
    else Array(CatRows.of(table.appendedBetween(s0, e0), schemaAt))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CatReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One partition of a driver-memory table snapshot. Small payloads
  * ship inline in the task binary (one serialization, no broadcast
  * round-trip for a 25-row dim); payloads past [[CatRows.InlineMaxBytes]]
  * ship as a torrent BROADCAST instead — a task binary is serialized
  * through the DRIVER once per task (and warns past 1 MiB; at sf1 the
  * inline form hit 1.2 MiB and would scale with the table), while a
  * broadcast distributes executor-to-executor and is fetched once per
  * executor, not per task.
  */
final case class CatRows(inline: Seq[Row],
    bc: Option[org.apache.spark.broadcast.Broadcast[Array[Row]]],
    schema: StructType)
  extends InputPartition {
  def rowIterator: Iterator[Row] =
    bc.map(_.value.iterator).getOrElse(inline.iterator)
}

object CatRows {
  /** Inline-vs-broadcast cutover, comfortably under the scheduler's
    * 1000 KiB large-task warning.
    */
  val InlineMaxBytes: Long = 256L << 10

  def of(rows: Seq[Row], schema: StructType): CatRows = {
    // defaultSize charges a fixed ~20 bytes per string/binary field, so
    // a few rows of large text could blow past the cutover while still
    // "estimating" small and re-trigger the large-task warning this
    // split exists to avoid — measure variable-width values for real
    val fixed = schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.StringType |
            org.apache.spark.sql.types.BinaryType |
            _: org.apache.spark.sql.types.ArrayType |
            _: org.apache.spark.sql.types.MapType |
            _: org.apache.spark.sql.types.StructType => 0L
        case dt => dt.defaultSize.toLong
      }
    }
    def varWidth(v: Any): Long = v match {
      case null                => 0L
      case s: String           => 2L * s.length + 16
      case b: Array[Byte]      => b.length.toLong + 16
      case a: scala.collection.Seq[_] => 16L + a.iterator.map(varWidth).sum
      case m: scala.collection.Map[_, _] =>
        16L + m.iterator.map { case (k, u) => varWidth(k) + varWidth(u) }.sum
      case r: Row              => 16L + r.toSeq.map(varWidth).sum
      case _                   => 8L
    }
    val fixedPerRow = fixed.sum + 16L
    var est = 0L
    val it = rows.iterator
    while (est <= InlineMaxBytes && it.hasNext) {
      val r = it.next()
      var vw = 0L
      var i = 0
      while (i < schema.length && i < r.length) {
        if (fixed(i) == 0L) vw += varWidth(r.get(i))
        i += 1
      }
      est += fixedPerRow + vw
    }
    if (est <= InlineMaxBytes) CatRows(rows, None, schema)
    else CatRows(Seq.empty,
      Some(org.apache.spark.sql.SparkSession.active.sparkContext
        .broadcast(rows.toArray)), schema)
  }
}

/** Per-partition delta ops of a merge-on-read commit: row ids to
  * delete, (row id → replacement row) updates, and inserted rows.
  */
final case class DeltaOps(partitionId: Int, deletes: Seq[Seq[Any]],
    updates: Seq[(Seq[Any], Row)], inserts: Seq[Row])
  extends WriterCommitMessage

/** Task-side writer for the DELTA (merge-on-read) row-level path:
  * Spark's WriteDeltaExec calls delete/update/insert per CHANGED row
  * with the row-id projection alongside — carried rows never reach
  * the writer, which is the whole point of the mode.
  */
final class DeltaMemWriterFactory(dataSchema: StructType,
    idSchema: StructType) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private val dataDeser = org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder(org.apache.spark.sql.catalyst.encoders
          .RowEncoder.encoderFor(dataSchema))
        .resolveAndBind().createDeserializer()
      private val idDeser = org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder(org.apache.spark.sql.catalyst.encoders
          .RowEncoder.encoderFor(idSchema))
        .resolveAndBind().createDeserializer()
      private val dels = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      private val upds =
        scala.collection.mutable.ArrayBuffer.empty[(Seq[Any], Row)]
      private val inss = scala.collection.mutable.ArrayBuffer.empty[Row]
      override def delete(meta: InternalRow, id: InternalRow): Unit =
        dels += idDeser(id).toSeq
      override def update(meta: InternalRow, id: InternalRow,
          row: InternalRow): Unit =
        upds += ((idDeser(id).toSeq, dataDeser(row)))
      override def insert(row: InternalRow): Unit =
        inss += dataDeser(row)
      override def commit(): WriterCommitMessage =
        DeltaOps(partitionId, dels.toSeq, upds.toSeq, inss.toSeq)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

/** Writer for the copy-on-write (ReplaceData) commit of a row-level
  * operation. `LogicalWriteInfo.schema()` carries the DATA schema, but
  * for a connector with NO metadata columns Spark's `ReplaceDataExec`
  * picks the plain writing task, which hands rows through UNPROJECTED
  * — each record is the raw `MergeRows` output: a leading
  * `__row_operation` int (`RowDeltaUtils.{WRITE,WRITE_WITH_METADATA}
  * _OPERATION`, both meaning "this row survives") followed by the
  * data columns. (With metadata columns — Iceberg's `_file`/`_pos` —
  * Spark itself projects via `DataAndMetadataWritingSparkTask`.) The
  * writer detects the wider layout by field count and strips the
  * operation column; plain data-width rows pass through unchanged,
  * so the factory stays correct if Spark ever projects this path.
  */
final class CowWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      private val opSchema = StructType(
        org.apache.spark.sql.types.StructField(
          org.apache.spark.sql.catalyst.util.RowDeltaUtils.OPERATION_COLUMN,
          org.apache.spark.sql.types.IntegerType, nullable = false)
          +: schema.fields)
      private def deserFor(s: StructType) =
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder(org.apache.spark.sql.catalyst.encoders
            .RowEncoder.encoderFor(s))
          .resolveAndBind().createDeserializer()
      private lazy val deserData = deserFor(schema)
      private lazy val deserOp = deserFor(opSchema)
      override def write(record: InternalRow): Unit =
        buf += (
          if (record.numFields == schema.length) deserData(record.copy())
          else Row.fromSeq(deserOp(record.copy()).toSeq.tail))
      override def commit(): WriterCommitMessage =
        graft.sources.synth.MemRows(partitionId, buf.toSeq)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}

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

  /** Top-level column names a predicate references (children first,
    * literals contribute nothing). Used for partition-only routing.
    */
  def references(p: Predicate, schema: StructType = null): Set[String] = {
    def walk(e: org.apache.spark.sql.connector.expressions.Expression)
        : Set[String] = e match {
      case nr: NamedReference => Set(nr.fieldNames.mkString("."))
      case other => other.children().toSet.flatMap(walk)
    }
    walk(p)
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
