package graft.llm

/** Crash-atomic MANIFEST-pointer commits for the disk index families
  * (LSH / IVF / IVF×PQ / BM25) — the Iceberg commit shape, applied to
  * the index lifecycle.
  *
  * Layout: an index ROOT directory holds immutable versioned
  * subdirectories (`v00001/`, `v00002/`, …) plus ONE small pointer
  * file, `MANIFEST`, whose content names the current version. Every
  * mutating verb (build, append, delete, compact) stages a COMPLETE
  * new version and then commits with a single atomic rename of the
  * pointer file. Readers resolve the pointer once per query and only
  * ever see a fully-committed version:
  *
  *   - crash while STAGING → the pointer still names the old version;
  *     the half-written `stage-v*` dir is invisible garbage (GC'd by
  *     the first commit after it ages past [[StageTtlMs]] — never
  *     sooner, because a fresh stage dir may be a concurrent builder
  *     mid-build);
  *   - crash BETWEEN staging and commit → same;
  *   - crash inside commit after the stage dir's rename but before
  *     the pointer write → an unreferenced `v*` dir, invisible to
  *     readers, reaped by the next commit's GC;
  *   - crash AFTER the pointer rename → the new version serves; the
  *     superseded dir is garbage until GC.
  *
  * There is no reachable intermediate state — the three-artifact
  * windows of the previous layout (stats rewritten while tombstones
  * persist → double subtraction; the two-rename gap where the index
  * path did not exist) are structurally gone. IndexManifestSpec
  * injects failures at the commit failpoint and pins serve
  * bit-equality to either side.
  *
  * ==Carry-forward: two layouts==
  *
  * How a staged version inherits the artifacts it does NOT rewrite is
  * the ONE mechanism that differs per deployment filesystem, chosen
  * per ROOT at creation time (pinned in the root's `LAYOUT` file, set
  * from [[DefaultLayout]] — conf `spark.graft.indexLayout` — by the
  * first [[stage]]; a root never changes layout mid-life):
  *
  *   - `link` (default; posix filesystems): unchanged artifacts carry
  *     as HARD LINKS (O(file-count) metadata ops, zero bytes copied).
  *     Requires `Files.createLink` — local disk, NFS, not S3/GCS.
  *   - `listing` (object stores — the 100 TB deployment): the staged
  *     version records a per-version file LISTING (`FILES`: one
  *     root-relative path per carried artifact location) instead of
  *     linking bytes; the read path ([[artifactPaths]]) resolves an
  *     artifact to its real dir (if the version rewrote it) plus every
  *     listed location. No links, no renames of data files, no
  *     directory mutation of committed versions — exactly the
  *     Iceberg/Delta manifest design, so the whole lifecycle runs on
  *     stores with no hard links. GC keeps any version dir that a
  *     retained/pinned version's listing still references; physical
  *     reclamation of superseded bytes therefore happens at
  *     COMPACTION (which rewrites artifacts and drops the refs), the
  *     same story as Iceberg's rewrite-then-expire.
  *
  * The commit protocol is identical in both layouts; only the
  * carry-forward mechanism changes. [[artifactPaths]] is uniform: a
  * `link` root simply never has a `FILES` listing, so resolution
  * degenerates to the version's own artifact dir. (The two remaining
  * rename sites — stage-dir finalization and the pointer flip — are
  * small metadata objects; on a store with no atomic rename they map
  * to the usual copy+conditional-put of a log commit. That adapter is
  * out of scope here; everything CORPUS-scale is rename-free under
  * `listing`.)
  *
  * Concurrency contract (readers): commits retain the superseded
  * version ([[RetainVersions]]), so a reader that resolved
  * [[currentDir]] before a commit finishes its lazy scan against
  * intact files — one concurrent commit per in-flight read is safe.
  * Readers that must survive a CHAIN of commits (append → delete →
  * compact while a lazy scan drains) take a [[pinCurrent]] READER PIN:
  * a heartbeat file under `root/pins/` naming their version, which
  * commit-time GC respects until [[ReaderPin.release]] (or staleness
  * past [[ReaderPinTtlMs]]). Storage is reclaimed by
  * [[expireVersions]] (explicit, like the catalog's expire-keep-N),
  * never by a commit racing a pinned reader.
  *
  * Concurrency contract (writers): two builders racing one root are
  * SAFE and serialize at three points —
  *
  *   - [[stage]] reserves its version number with an atomic mkdir
  *     (`stage-v<N>/`), so concurrent stagers never share a dir;
  *   - staged dirs are invisible to a concurrent commit's GC until
  *     [[StageTtlMs]] old — liveness is read from the stage dir's
  *     `STAGE_ACTIVITY` heartbeat (bumped by [[stage]]/[[carry]];
  *     long-running builds call [[touchStage]]) with a full tree walk
  *     only as the legacy fallback, so GC under the commit lock stays
  *     O(stage-dirs), not O(stage-tree-files);
  *   - [[commit]] runs under a per-root lock (in-process monitor +
  *     cross-process file lock on `COMMIT_LOCK`): the lineage is
  *     re-read inside the critical section, so the resulting order is
  *     last-commit-wins with EVERY committed version retained in the
  *     lineage (up to `retain`) — a concurrent commit can reorder, but
  *     never lose or corrupt, a committed version.
  *
  * Plain [[commit]] is last-commit-wins: a commit staged against a
  * base that a concurrent writer superseded still lands (its content
  * simply does not include the other writer's delta — both versions
  * stay on disk in the lineage). That is the right contract ONLY for
  * full rebuilds, whose staged content is self-contained. Every
  * CONTENT-DEPENDENT mutation (append / delete / compact — anything
  * that carries or reads the current version) instead runs under
  * [[mutate]]: the base version is captured and PINNED under the
  * commit lock (a `BASE` file in the stage dir that GC respects, so
  * the carry source can never be reaped mid-carry — and mid-build
  * Spark reads of the base stay valid), the commit is compare-and-swap
  * via [[commitCas]], and a lost race ([[ConcurrentCommitException]])
  * discards the stale stage and REBASES: the whole verb re-runs
  * against the new current. Two concurrent mutations therefore
  * compose — a tombstone delete racing an append lands ON TOP of the
  * append (or vice versa), never silently dropped
  * (ConcurrentIndexWriterSpec races the real verbs and asserts both
  * deltas serve).
  */
/** A CAS commit found the root's current version moved underneath it:
  * the staged version was built from `expectedBase`, but `actual` is
  * now committed. The staged dir is left intact — rebase and retry
  * ([[IndexManifest.mutate]] automates exactly that).
  */
final class ConcurrentCommitException(root: String,
    expectedBase: Option[String], actual: Option[String])
  extends RuntimeException(
    s"concurrent commit at $root: staged against base $expectedBase " +
      s"but current is $actual")

object IndexManifest {
  val PointerFile = "MANIFEST"
  val LockFile = "COMMIT_LOCK"
  /** Root-level marker pinning the root's carry-forward layout. */
  val LayoutFile = "LAYOUT"
  /** Per-version carry listing (layout `listing`): lines of
    * `artifact<TAB>root-relative-physical-dir`.
    */
  val ListingFile = "FILES"
  /** Stage-dir pin naming the version a mutation carries from. */
  val BaseFile = "BASE"
  /** Stage-dir liveness heartbeat (see [[touchStage]]). */
  val ActivityFile = "STAGE_ACTIVITY"
  /** Root subdir holding reader-pin heartbeat files. */
  val PinsDir = "pins"

  val LinkLayout = "link"
  val ListingLayout = "listing"

  /** Layout for NEW roots (existing roots keep their `LAYOUT` file).
    * Set from conf `spark.graft.indexLayout` by the session entry
    * points (Verify / Bench / GraftSession) or the system property of
    * the same name; [[withLayout]] scopes an override.
    */
  @volatile var DefaultLayout: String =
    sys.props.getOrElse("spark.graft.indexLayout", LinkLayout)

  // Scoped overrides are THREAD-LOCAL (DynamicVariable), so a
  // withLayout(listing) window on one thread can never make a
  // concurrent thread's stage() pin the wrong layout or its
  // freshForLayout wipe an unrelated fresh root.
  private val layoutOverride =
    new scala.util.DynamicVariable[Option[String]](None)

  /** The layout new roots adopt right now: the innermost
    * [[withLayout]] override on THIS thread, else [[DefaultLayout]].
    */
  def effectiveLayout: String =
    layoutOverride.value.getOrElse(DefaultLayout)

  /** Scope a layout override for the duration of `body` on the
    * current thread only (a DynamicVariable, not a global swap —
    * concurrent threads keep seeing [[DefaultLayout]] or their own
    * override).
    */
  def withLayout[T](layout: String)(body: => T): T = {
    require(layout == LinkLayout || layout == ListingLayout,
      s"unknown index layout '$layout' (want link|listing)")
    layoutOverride.withValue(Some(layout))(body)
  }

  /** Stamp-gate freshness helper for build-once CACHE roots (the
    * query registry's stamp-gated indexes — derived data a gate
    * rebuilds from the fixture whenever stale): an existing root only
    * counts as reusable when its pinned layout matches the session
    * default, and a mismatched root is WIPED here so the gate's
    * rebuild adopts the session layout (a root's layout is immutable
    * in place — rebuilding versions onto it would keep the old
    * mechanism and silently fake a listing certification). The wipe
    * keys on the ROOT DIRECTORY, not the committed pointer: a crashed
    * first build that left `LAYOUT` + stage dirs but never committed
    * must not leak its stale layout into the rebuild. Callers must
    * evaluate this gate UNCONDITIONALLY (first conjunct, or a
    * standalone val) — short-circuiting it behind a stamp check skips
    * the wipe exactly when the rebuild is about to run. Cache roots
    * only; never point this at an index whose history you keep.
    * Callers hold their gate's lock.
    */
  def freshForLayout(root: String): Boolean = {
    if (new java.io.File(root).exists() &&
        layoutOf(root) != effectiveLayout) {
      Similarity.rmTree(new java.io.File(root))
      false
    } else exists(root)
  }

  /** The root's pinned layout; roots created before the `LAYOUT`
    * marker existed are `link` (what they were built with).
    */
  def layoutOf(root: String): String = {
    val f = java.nio.file.Paths.get(root, LayoutFile)
    if (java.nio.file.Files.exists(f))
      java.nio.file.Files.readString(f).trim match {
        case ListingLayout => ListingLayout
        case _ => LinkLayout
      }
    else LinkLayout
  }

  /** Age past which an uncommitted stage dir is considered abandoned
    * and eligible for GC. Generous by design: a concurrent builder's
    * stage must never be reaped mid-build, and a 100 TB index build
    * legitimately runs hours (builds longer than the TTL keep
    * themselves live via [[touchStage]]). Crash garbage costs only
    * storage, and only until the first commit after the TTL.
    */
  @volatile var StageTtlMs: Long = 24L * 3600 * 1000

  /** Age past which a reader pin with no heartbeat refresh is
    * considered leaked (reader died without [[ReaderPin.release]])
    * and stops protecting its version from GC.
    */
  @volatile var ReaderPinTtlMs: Long = 24L * 3600 * 1000

  // per-root in-process commit monitors (File locks exclude PROCESSES;
  // within one JVM they throw OverlappingFileLockException instead of
  // blocking, so threads need a real monitor in front)
  private val rootLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def withCommitLock[T](root: String)(body: => T): T = {
    val key = scala.util.Try(
      new java.io.File(root).getCanonicalPath).getOrElse(root)
    rootLocks.computeIfAbsent(key, _ => new Object).synchronized {
      java.nio.file.Files
        .createDirectories(java.nio.file.Paths.get(root))
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(root, LockFile),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        // blocks until any other PROCESS's commit ends. Two ALIASES of
        // one root (symlink, canonicalization failure) take different
        // in-process monitors but the SAME OS file — the second
        // thread's lock() then throws OverlappingFileLockException
        // instead of blocking; treat it as "busy" and wait, which is
        // what a single monitor would have done
        var fl: java.nio.channels.FileLock = null
        while (fl == null)
          try fl = ch.lock()
          catch {
            case _: java.nio.channels.OverlappingFileLockException =>
              Thread.sleep(20)
          }
        try body finally fl.release()
      } finally ch.close()
    }
  }

  /** Test hook: invoked immediately BEFORE the atomic pointer rename.
    * Crash-injection specs throw here to simulate dying between
    * staging and commit.
    */
  @volatile private[graft] var failpoint: String => Unit = _ => ()

  /** Test hook: the hard-link primitive (layout `link` only). Specs
    * for the `listing` layout swap in a throwing impl to prove the
    * posix-only call is never reached on an object-store root.
    */
  @volatile private[graft] var linkFn:
      (java.nio.file.Path, java.nio.file.Path) => Unit =
    (to, from) => { java.nio.file.Files.createLink(to, from): Unit }

  private def pointer(root: String) =
    java.nio.file.Paths.get(root, PointerFile)

  // {5,} not {5}: f"v$next%05d" widens past five digits at version
  // 100000, and the parser must accept every name the formatter can
  // produce (else stage() recomputes max from 5-digit dirs and
  // collides, and gc() never reclaims the wide ones)
  private val VersionName = "v\\d{5,}".r

  /** Default for how many committed versions [[commit]] retains
    * (current plus N−1 predecessors). Two, not one: readers resolve
    * [[currentDir]] once and then scan lazily, so a concurrent
    * writer's commit must not delete the version a mid-query reader
    * is standing on. NOTE the bound this buys: one level of retention
    * covers exactly ONE commit per in-flight read — a caller that
    * chains mutations (append then delete) while a lazy scan is still
    * draining unlinks that reader's version on the SECOND commit.
    * Callers with longer reader windows either pass a larger `retain`
    * to [[commit]] or — safe by construction, not convention — take a
    * [[pinCurrent]] reader pin, which GC respects regardless of how
    * many commits land while the scan drains. Storage is reclaimed
    * explicitly via [[expireVersions]].
    */
  val RetainVersions = 2

  /** The committed version name, if any. */
  def current(root: String): Option[String] =
    history(root).headOption

  /** Committed lineage, newest first (the MANIFEST's lines). Old
    * single-line manifests parse as a one-element history.
    */
  def history(root: String): Seq[String] = {
    val p = pointer(root)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.readString(p).linesIterator
        .map(_.trim).filter(_.nonEmpty).toSeq
    else Seq.empty
  }

  def exists(root: String): Boolean = current(root).isDefined

  /** Resolve the committed version directory readers must use. */
  def currentDir(root: String): String = current(root) match {
    case Some(v) => s"$root/$v"
    case None => throw new IllegalStateException(
      s"no committed index at $root (missing $PointerFile)")
  }

  /** Physical directories composing artifact `name` of `version`
    * (default: the current version) — THE read-path resolver, uniform
    * across layouts: the version's own `name/` dir if it rewrote or
    * appended the artifact, plus every location its `FILES` listing
    * carries (always empty on `link` roots, whose carry materializes
    * links instead). Empty ⇒ the artifact does not exist in that
    * version. Listed refs are physical by construction ([[carry]]
    * resolves through the base's own listing), so resolution never
    * chains.
    */
  def artifactPaths(root: String, name: String,
      version: Option[String] = None): Seq[String] =
    version.orElse(current(root)).toSeq
      .flatMap(v => physicalPaths(root, v, name))
      .map(rel => s"$root/$rel")

  /** Read artifact `name` (of `version`, default current) as one
    * DataFrame across however many physical locations compose it.
    * Locations are read ONE PER SCAN and unioned (a multi-path read
    * would demand a shared partition-discovery basePath, which
    * listing-carried dirs don't have): each location stays its own
    * partition-discovery root, so `table=`/`bkt=` columns survive,
    * and predicate pushdown through the Union keeps partition PRUNING
    * per branch (pinned by IndexListingSpec against the executed
    * plan).
    */
  def readArtifact(spark: org.apache.spark.sql.SparkSession,
      root: String, name: String,
      version: Option[String] = None): org.apache.spark.sql.DataFrame = {
    val paths = artifactPaths(root, name, version)
    require(paths.nonEmpty,
      s"index artifact '$name' missing at $root (version=$version)")
    paths.map(spark.read.parquet(_)).reduce(_ unionByName _)
  }

  /** Whether artifact `name` exists with at least one parquet file —
    * the optional-artifact probe (tombstones, level-0 deltas).
    */
  def artifactNonEmpty(root: String, name: String,
      version: Option[String] = None): Boolean =
    artifactPaths(root, name, version)
      .exists(p => hasParquet(new java.io.File(p)))

  private def hasParquet(f: java.io.File): Boolean =
    f.isDirectory && Option(f.listFiles())
      .getOrElse(Array.empty[java.io.File])
      .exists(c => (c.isFile && c.getName.endsWith(".parquet")) ||
        hasParquet(c))

  private def physicalPaths(root: String, version: String,
      name: String): Seq[String] = {
    val own =
      if (new java.io.File(root, s"$version/$name").exists())
        Seq(s"$version/$name")
      else Seq.empty
    (own ++ refsOf(new java.io.File(root, version))
      .collect { case (n, p) if n == name => p }).distinct
  }

  /** Parsed `FILES` listing of a version or stage dir (empty if none:
    * every `link`-root dir, and `listing` versions that carried
    * nothing).
    */
  private def refsOf(dir: java.io.File): Seq[(String, String)] = {
    val f = new java.io.File(dir, ListingFile)
    if (!f.isFile) Seq.empty
    else java.nio.file.Files.readString(f.toPath).linesIterator
      .map(_.trim).filter(_.nonEmpty)
      .flatMap { line =>
        line.split("\t", 2) match {
          case Array(n, p) => Some((n, p))
          case _ => None
        }
      }.toSeq
  }

  /** Stage the next version: atomically reserves version number N+1
    * (N = max over committed, abandoned AND in-flight stage dirs) by
    * creating `root/stage-v<N+1>/` — mkdir is the reservation, so two
    * concurrent stagers can NEVER share a dir (the loser's mkdir
    * throws and it takes the next number). Returns (versionName,
    * stagedDirPath); [[commit]] renames the stage dir to its final
    * `v<N>` name. Never touches the pointer. A brand-new root gets
    * its `LAYOUT` pinned to [[effectiveLayout]] here (existing roots
    * keep theirs — a root never changes layout mid-life).
    */
  def stage(root: String): (String, String) = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val layoutPath = java.nio.file.Paths.get(root, LayoutFile)
    if (!java.nio.file.Files.exists(layoutPath) &&
        !java.nio.file.Files.exists(pointer(root)) &&
        versionDirs(root).isEmpty)
      try java.nio.file.Files.writeString(layoutPath, effectiveLayout,
        java.nio.file.StandardOpenOption.CREATE_NEW): Unit
      catch { // a racing stager pinned it first — theirs stands
        case _: java.nio.file.FileAlreadyExistsException => ()
      }
    var next = (versionDirs(root) ++ stageDirs(root))
      .map(f => f.getName.dropWhile(!_.isDigit).toInt)
      .foldLeft(0)(math.max) + 1
    while (true) {
      val name = f"v$next%05d"
      try {
        java.nio.file.Files
          .createDirectory(java.nio.file.Paths.get(root, s"stage-$name"))
        touchStage(s"$root/stage-$name")
        return (name, s"$root/stage-$name")
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => next += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Bump the stage dir's liveness heartbeat. [[stage]] and [[carry]]
    * call it; a builder whose WRITE phase alone can outlast
    * [[StageTtlMs]] calls it periodically (GC reads this one file's
    * mtime instead of walking the stage tree under the commit lock).
    */
  def touchStage(stagedDir: String): Unit = {
    val f = java.nio.file.Paths.get(stagedDir, ActivityFile)
    try {
      if (java.nio.file.Files.exists(f))
        java.nio.file.Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis())): Unit
      else
        java.nio.file.Files.createFile(f): Unit
    } catch { case _: java.io.IOException => () } // liveness is best-effort
  }

  private def baseOf(stagedDir: String): Option[String] = {
    val f = java.nio.file.Paths.get(stagedDir, BaseFile)
    if (java.nio.file.Files.exists(f))
      Some(java.nio.file.Files.readString(f).trim).filter(_.nonEmpty)
    else None
  }

  /** A content-dependent mutation of an index root: stage → carry →
    * write → CAS-commit, with automatic REBASE on a lost race. The
    * base version is captured and pinned UNDER THE COMMIT LOCK (the
    * stage dir's `BASE` file, which [[gc]] respects), so the version
    * the body carries from and lazily reads cannot be reaped by
    * concurrent commits mid-build. The body must finish with
    * [[commitCas]]`(root, m.version, m.base)`; if a concurrent commit
    * moved the root first, the stale stage is discarded and the WHOLE
    * body re-runs against the new current — mutations compose instead
    * of silently dropping each other's deltas. Bodies are re-entrant
    * by construction here (pure stage-dir writes + idempotent reads).
    */
  final case class Mutation(base: Option[String], version: String,
      dir: String)

  def mutate[T](root: String, attempts: Int = 5)(body: Mutation => T): T = {
    var last: ConcurrentCommitException = null
    var i = 0
    while (i < attempts) {
      val (v, staged) = stage(root)
      // pin the base under the lock: current() cannot move and GC
      // cannot run until the BASE file is on disk, so the pin is
      // never written against an already-reaped version
      val base = withCommitLock(root) {
        val b = current(root)
        b.foreach(bv => java.nio.file.Files.writeString(
          java.nio.file.Paths.get(staged, BaseFile), bv): Unit)
        b
      }
      try return body(Mutation(base, v, staged))
      catch {
        case e: ConcurrentCommitException =>
          Similarity.rmTree(new java.io.File(staged))
          last = e
          i += 1
      }
    }
    throw last
  }

  /** THE commit: prepend `version` to the committed lineage, truncate
    * to `retain` versions (default [[RetainVersions]]), write the
    * lines to a temp file (fsynced), and rename it over `MANIFEST`
    * atomically (posix rename replaces; the parent dir is fsynced
    * after the move so the rename survives power loss where the
    * filesystem allows directory fsync). Version dirs outside the
    * retained lineage — expired ancestors and abandoned stage dirs
    * alike — are GC'd after the flip (minus reader-pinned versions
    * and, on `listing` roots, versions still referenced by a retained
    * listing); a crash mid-GC leaves only orphan dirs, never
    * serveable state, and the next commit re-collects them. `retain`
    * is the reader-overlap window: a reader's resolved version
    * survives `retain − 1` subsequent commits, so roots whose callers
    * chain mutations under lazy readers pass the chain length + 1 —
    * or the reader takes a [[pinCurrent]] pin and needs no counting.
    * Returns the COMMITTED version name — usually `version`, but a
    * double-allocated number (the readdir-vs-rename race) is
    * renumbered inside the lock, so any caller referencing its own
    * commit afterwards must use the returned name. Replaying a commit
    * whose version dir no longer exists (a crash-recovery misuse)
    * fails loudly instead of publishing a dangling pointer.
    */
  def commit(root: String, version: String,
      retain: Int = RetainVersions,
      expectedBase: Option[String] = None): String =
    commitImpl(root, version, retain, expectedBase.map(b => Some(b)))

  /** CAS commit for [[mutate]] bodies: REQUIRES the current version to
    * still equal `base` (None = still-empty root), else throws
    * [[ConcurrentCommitException]]. Unlike [[commit]]'s optional
    * `expectedBase`, the check always applies — an append staged
    * against an empty root loses to a concurrent build, too.
    */
  def commitCas(root: String, version: String, base: Option[String],
      retain: Int = RetainVersions): String =
    commitImpl(root, version, retain, Some(base))

  private def commitImpl(root: String, version: String, retain: Int,
      cas: Option[Option[String]]): String = {
    failpoint(s"commit:$root")
    withCommitLock(root) {
      // CAS gate: the lineage is read INSIDE the critical section, so
      // the check and the pointer flip are one atomic step
      val cur = current(root)
      cas.foreach { base =>
        if (cur != base)
          throw new ConcurrentCommitException(root, base, cur)
      }
      // finalize the staged dir under its committed name (atomic; a
      // crash after this rename but before the pointer write leaves an
      // unreferenced v-dir — invisible to readers, reaped by later GC).
      // The name may need RE-NUMBERING: stage()'s readdir can race a
      // concurrent commit's rename and miss that version under BOTH
      // its names (stage-vN already renamed away, vN enumerated at an
      // earlier dirent position), double-allocating N. All final-name
      // renames happen inside this lock, so the existence check here
      // is authoritative and the next free number cannot be taken by
      // another committer while we hold it.
      val stagePath = java.nio.file.Paths.get(root, s"stage-$version")
      var finalName = version
      if (java.nio.file.Files.isDirectory(stagePath)) {
        if (java.nio.file.Files.exists(
            java.nio.file.Paths.get(root, version)))
          finalName = f"v${(versionDirs(root) ++ stageDirs(root))
            .map(_.getName.dropWhile(!_.isDigit).toInt)
            .foldLeft(0)(math.max) + 1}%05d"
        java.nio.file.Files.move(stagePath,
          java.nio.file.Paths.get(root, finalName),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
      }
      val finalDir = java.nio.file.Paths.get(root, finalName)
      // replay guard: publishing a pointer to a version with no dir
      // (commit re-driven after a crash + GC already reaped it) must
      // fail loudly, not serve a dangling current
      if (!java.nio.file.Files.isDirectory(finalDir))
        throw new IllegalStateException(
          s"commit of missing version at $root: $finalName has no " +
            "directory (stage consumed or GC'd — re-run the build, " +
            "don't replay the commit)")
      // builder-private pins don't belong in a committed version
      java.nio.file.Files.deleteIfExists(finalDir.resolve(BaseFile)): Unit
      java.nio.file.Files
        .deleteIfExists(finalDir.resolve(ActivityFile)): Unit
      val retained = (finalName +: history(root)
        .filterNot(_ == finalName)).take(math.max(1, retain))
      writePointer(root, retained)
      gc(root)
      // the COMMITTED name — may differ from `version` after a
      // renumber; callers that reference their own commit afterwards
      // (logging, CAS chains) must use this
      finalName
    }
  }

  /** Explicit history expiry — the index twin of the catalog's
    * expire-keep-N: truncate the retained lineage to `keep` versions
    * (min 1, the current) and GC everything outside it (reader pins
    * and listing references still hold their versions). Commit never
    * reclaims the immediately-superseded version ([[RetainVersions]]);
    * this verb is how storage is actually released.
    */
  def expireVersions(root: String, keep: Int = 1): Unit =
    withCommitLock(root) {
      val h = history(root)
      require(h.nonEmpty, s"no committed index at $root")
      writePointer(root, h.take(math.max(1, keep)))
      gc(root)
    }

  private def writePointer(root: String, lineage: Seq[String]): Unit = {
    val tmp = java.nio.file.Paths.get(root, s"$PointerFile.tmp")
    java.nio.file.Files.writeString(tmp, lineage.mkString("\n"))
    val ch = java.nio.channels.FileChannel.open(tmp,
      java.nio.file.StandardOpenOption.WRITE)
    try ch.force(true) finally ch.close()
    java.nio.file.Files.move(tmp, pointer(root),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // The rename IS the commit: fsync the parent directory so the
    // directory entry survives power loss too (contents-fsync alone
    // leaves the rename in the dirty dentry cache). Best-effort —
    // some filesystems refuse opening a directory for read; there the
    // old pointer stays serveable, so losing the rename only rewinds
    // to the previous committed version, never corrupts.
    try {
      val dir = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(root),
        java.nio.file.StandardOpenOption.READ)
      try dir.force(true) finally dir.close()
    } catch { case _: java.io.IOException => () }
  }

  /** PIN the current version against GC across ANY number of
    * subsequent commits — the safe-by-construction alternative to
    * sizing `retain` by hand when a lazy scan (toLocalIterator, a
    * draining export) must outlive a mutation chain. Taken under the
    * commit lock, so the pin can never be written against a version a
    * racing commit's GC already reaped. The pin is a heartbeat file
    * (`root/pins/`): call [[ReaderPin.refresh]] from scans that
    * outlive [[ReaderPinTtlMs]], and ALWAYS [[ReaderPin.release]]
    * when done — a leaked pin holds the version's storage until the
    * TTL expires it.
    */
  def pinCurrent(root: String): ReaderPin = withCommitLock(root) {
    val v = current(root).getOrElse(throw new IllegalStateException(
      s"no committed index at $root"))
    val dir = java.nio.file.Paths.get(root, PinsDir)
    java.nio.file.Files.createDirectories(dir)
    val f = dir.resolve(s"pin-${java.util.UUID.randomUUID()}.pin")
    java.nio.file.Files.writeString(f, v)
    new ReaderPin(root, v, f)
  }

  /** [[pinCurrent]] with release BY CONSTRUCTION: the pin is released
    * in `finally`, so a body that throws mid-scan cannot leak the pin
    * for [[ReaderPinTtlMs]] (24 h of held storage) — the same
    * ergonomics `withPersist` gives the cache lifecycle. Prefer this
    * over raw [[pinCurrent]]/`release` everywhere the scan's lifetime
    * is lexically scoped; keep the raw pair only for pins that
    * genuinely outlive a scope (handed to another thread or stage).
    */
  def withPin[T](root: String)(body: ReaderPin => T): T = {
    val pin = pinCurrent(root)
    try body(pin) finally pin.release()
  }

  final class ReaderPin private[IndexManifest](val root: String,
      val version: String, file: java.nio.file.Path) {
    /** The pinned version's directory (resolve artifacts against it
      * via [[artifactPaths]]`(root, name, Some(version))`).
      */
    def dir: String = s"$root/$version"
    /** Heartbeat: scans longer than [[ReaderPinTtlMs]] call this to
      * stay protected.
      */
    def refresh(): Unit =
      java.nio.file.Files.setLastModifiedTime(file,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis())): Unit
    def release(): Unit =
      java.nio.file.Files.deleteIfExists(file): Unit
  }

  /** Versions protected by live reader pins; stale pin files (leaked
    * readers) are reaped here as a side effect.
    */
  private def pinnedVersions(root: String): Seq[String] = {
    val dir = new java.io.File(root, PinsDir)
    val cutoff = System.currentTimeMillis() - ReaderPinTtlMs
    Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(_.getName.endsWith(".pin"))
      .flatMap { f =>
        if (f.lastModified() < cutoff) { f.delete(): Unit; None }
        else scala.util.Try(
          java.nio.file.Files.readString(f.toPath).trim).toOption
            .filter(_.nonEmpty)
      }.toSeq
  }

  /** Remove every version dir outside the REACHABLE set — the
    * retained lineage, reader-pinned versions, live stage dirs' BASE
    * pins, and (listing roots) every version a reachable dir's
    * `FILES` still references — plus stage dirs abandoned longer than
    * [[StageTtlMs]]. NEVER a fresh stage dir, which may be a
    * concurrent builder mid-build: liveness reads the
    * `STAGE_ACTIVITY` heartbeat when present (two stats, no tree
    * walk under the commit lock) and falls back to the full-tree
    * newest-mtime walk for legacy stage dirs without one. Callers
    * outside [[commit]]/[[expireVersions]] must hold the commit lock.
    */
  def gc(root: String): Unit = {
    val now = System.currentTimeMillis()
    val cutoff = now - StageTtlMs
    val (liveStages, deadStages) = stageDirs(root).partition { f =>
      val act = new java.io.File(f, ActivityFile)
      // heartbeat-fresh is the cheap fast path (two stats, no walk
      // under the commit lock); a STALE heartbeat falls back to the
      // full-tree newest-mtime walk before declaring the stage dead —
      // a build whose write phase outlasts StageTtlMs without calling
      // touchStage (artifact writes keep the tree fresh) must not be
      // reaped mid-build by a concurrent commit
      val hb =
        if (act.isFile) math.max(act.lastModified(), f.lastModified())
        else Long.MinValue
      hb >= cutoff || newestMtime(f) >= cutoff
    }
    val start = (history(root) ++ pinnedVersions(root) ++
      liveStages.flatMap(f => baseOf(f.getPath))).distinct
    // listing roots: a reachable version's FILES may reference older
    // versions' physical dirs — one hop suffices, refs are physical
    // by construction (carry resolves through the base's listing)
    val refs = (start.map(v => new java.io.File(root, v)) ++ liveStages)
      .flatMap(d => refsOf(d).map(_._2.takeWhile(_ != '/')))
    val keep = (start ++ refs).toSet
    versionDirs(root).filterNot(f => keep.contains(f.getName))
      .foreach(Similarity.rmTree)
    deadStages.foreach(Similarity.rmTree)
  }

  private def newestMtime(f: java.io.File): Long = {
    val own = f.lastModified()
    val kids = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
    kids.foldLeft(own)((m, c) =>
      math.max(m, if (c.isDirectory) newestMtime(c) else c.lastModified()))
  }

  private def versionDirs(root: String): Array[java.io.File] =
    Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory &&
        VersionName.pattern.matcher(f.getName).matches())

  private val StageName = "stage-v\\d{5,}".r

  private def stageDirs(root: String): Array[java.io.File] =
    Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory &&
        StageName.pattern.matcher(f.getName).matches())

  /** Hard-link `src`'s tree into `dst` (directories created real,
    * files linked): the carry-forward step for artifacts a new version
    * leaves unchanged — `link` layout only. Spark job-temp droppings
    * (`_temporary`, `._*`) are skipped; `_SUCCESS` markers link fine.
    */
  def linkTree(src: String, dst: String): Unit = {
    val s = new java.io.File(src)
    if (!s.exists()) return
    def walk(from: java.io.File, to: java.io.File): Unit = {
      if (from.isDirectory) {
        java.nio.file.Files.createDirectories(to.toPath)
        from.listFiles().foreach { c =>
          if (c.getName != "_temporary" && !c.getName.startsWith("."))
            walk(c, new java.io.File(to, c.getName))
        }
      } else
        linkFn(to.toPath, from.toPath)
    }
    walk(s, new java.io.File(dst))
  }

  /** Carry artifact `name` from the base version into a staged
    * version dir, if present (absent artifacts — e.g. no pending
    * tombstones — stay absent). The base is the stage dir's pinned
    * `BASE` ([[mutate]]) when present, else the root's current
    * version. `link` roots materialize hard links; `listing` roots
    * append the base's physical locations of the artifact to the
    * staged `FILES` — zero data-file operations, which is the whole
    * object-store story. A verb must never carry an artifact it then
    * rewrites with overwrite semantics (the listing would resolve old
    * AND new); carried artifacts are either untouched or appended
    * INTO (new files beside the carried set), which both layouts
    * represent exactly.
    */
  def carry(root: String, stagedDir: String, name: String): Unit = {
    touchStage(stagedDir)
    baseOf(stagedDir).orElse(current(root)).foreach { v =>
      if (layoutOf(root) == ListingLayout) {
        val phys = physicalPaths(root, v, name)
        if (phys.nonEmpty) {
          val f = java.nio.file.Paths.get(stagedDir, ListingFile)
          val existing = refsOf(new java.io.File(stagedDir)).toSet
          val add = phys.map(p => (name, p)).filterNot(existing.contains)
          if (add.nonEmpty)
            java.nio.file.Files.writeString(f,
              (existing.toSeq ++ add)
                .map { case (n, p) => s"$n\t$p" }.sorted
                .mkString("", "\n", "\n")): Unit
        }
      } else
        linkTree(s"$root/$v/$name", s"$stagedDir/$name")
    }
  }
}
