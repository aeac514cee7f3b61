package graft.llm

/** Crash-atomic MANIFEST-pointer commits for the disk index families
  * (LSH / IVF / IVF×PQ / BM25) — the Iceberg commit shape, applied to
  * the index lifecycle.
  *
  * Layout: an index ROOT directory holds immutable versioned
  * subdirectories (`v00001/`, `v00002/`, …) plus ONE small pointer
  * file, `MANIFEST`, whose content names the current version. Every
  * mutating verb (build, append, delete, compact) stages a COMPLETE
  * new version — unchanged corpus-scale artifacts carried forward as
  * hard links (O(file-count) metadata ops, zero bytes copied) — and
  * then commits with a single atomic rename of the pointer file.
  * Readers resolve the pointer once per query and only ever see a
  * fully-committed version:
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
  * Concurrency contract (readers): commits retain the superseded
  * version ([[RetainVersions]]), so a reader that resolved
  * [[currentDir]] before a commit finishes its lazy scan against
  * intact files — one concurrent commit per in-flight read is safe.
  * Storage is reclaimed by [[expireVersions]] (explicit, like the
  * catalog's expire-keep-N), never by the commit racing the reader.
  *
  * Concurrency contract (writers): two builders racing one root are
  * SAFE and serialize at three points —
  *
  *   - [[stage]] reserves its version number with an atomic mkdir
  *     (`stage-v<N>/`), so concurrent stagers never share a dir;
  *   - staged dirs are invisible to a concurrent commit's GC until
  *     [[StageTtlMs]] old — a racing builder's in-progress work is
  *     never reaped under it;
  *   - [[commit]] runs under a per-root lock (in-process monitor +
  *     cross-process file lock on `COMMIT_LOCK`): the lineage is
  *     re-read inside the critical section, so the resulting order is
  *     last-commit-wins with EVERY committed version retained in the
  *     lineage (up to `retain`) — a concurrent commit can reorder, but
  *     never lose or corrupt, a committed version.
  *
  * Last-commit-wins means a commit staged against a base that a
  * concurrent writer superseded still lands (its content simply does
  * not include the other writer's delta — both versions stay on disk
  * in the lineage). Callers that need compare-and-swap semantics
  * instead pass `expectedBase` to [[commit]]: the commit then fails
  * with [[ConcurrentCommitException]] if the current version is no
  * longer the one the stage was built from, leaving the staged dir
  * intact for a rebase-and-retry.
  *
  * Scale note: hard links assume the local/posix filesystem the
  * single-node indexes live on; the 100 TB object-store deployment
  * replaces the link step with an Avro/JSON file LISTING inside the
  * version dir (same pointer-swap commit — this is precisely the
  * Iceberg/Delta log design), which the read path would resolve
  * instead of a directory scan. The commit protocol is identical; only
  * the carry-forward mechanism changes.
  */
/** A CAS commit found the root's current version moved underneath it:
  * the staged version was built from `expectedBase`, but `actual` is
  * now committed. The staged dir is left intact — rebase and retry.
  */
final class ConcurrentCommitException(root: String,
    expectedBase: Option[String], actual: Option[String])
  extends RuntimeException(
    s"concurrent commit at $root: staged against base $expectedBase " +
      s"but current is $actual")

object IndexManifest {
  val PointerFile = "MANIFEST"
  val LockFile = "COMMIT_LOCK"

  /** Age past which an uncommitted stage dir is considered abandoned
    * and eligible for GC. Generous by design: a concurrent builder's
    * stage must never be reaped mid-build, and a 100 TB index build
    * legitimately runs hours. Crash garbage costs only storage, and
    * only until the first commit after the TTL.
    */
  @volatile var StageTtlMs: Long = 24L * 3600 * 1000

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
        val fl = ch.lock() // blocks until any other PROCESS's commit ends
        try body finally fl.release()
      } finally ch.close()
    }
  }

  /** Test hook: invoked immediately BEFORE the atomic pointer rename.
    * Crash-injection specs throw here to simulate dying between
    * staging and commit.
    */
  @volatile private[graft] var failpoint: String => Unit = _ => ()

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
    * Callers with longer reader windows pass a larger `retain` to
    * [[commit]] (per-root, caller-chosen — the index twin of the
    * catalog's expire-keep-N); storage is reclaimed explicitly via
    * [[expireVersions]].
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

  /** Stage the next version: atomically reserves version number N+1
    * (N = max over committed, abandoned AND in-flight stage dirs) by
    * creating `root/stage-v<N+1>/` — mkdir is the reservation, so two
    * concurrent stagers can NEVER share a dir (the loser's mkdir
    * throws and it takes the next number). Returns (versionName,
    * stagedDirPath); [[commit]] renames the stage dir to its final
    * `v<N>` name. Never touches the pointer.
    */
  def stage(root: String): (String, String) = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    var next = (versionDirs(root) ++ stageDirs(root))
      .map(f => f.getName.dropWhile(!_.isDigit).toInt)
      .foldLeft(0)(math.max) + 1
    while (true) {
      val name = f"v$next%05d"
      try {
        java.nio.file.Files
          .createDirectory(java.nio.file.Paths.get(root, s"stage-$name"))
        return (name, s"$root/stage-$name")
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => next += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** THE commit: prepend `version` to the committed lineage, truncate
    * to `retain` versions (default [[RetainVersions]]), write the
    * lines to a temp file (fsynced), and rename it over `MANIFEST`
    * atomically (posix rename replaces; the parent dir is fsynced
    * after the move so the rename survives power loss where the
    * filesystem allows directory fsync). Version dirs outside the
    * retained lineage — expired ancestors and abandoned stage dirs
    * alike — are GC'd after the flip; a crash mid-GC leaves only
    * orphan dirs, never serveable state, and the next commit
    * re-collects them. `retain` is the reader-overlap window: a
    * reader's resolved version survives `retain − 1` subsequent
    * commits, so roots whose callers chain mutations under lazy
    * readers pass the chain length + 1. Returns the COMMITTED version
    * name — usually `version`, but a double-allocated number (the
    * readdir-vs-rename race) is renumbered inside the lock, so any
    * caller referencing its own commit afterwards must use the
    * returned name.
    */
  def commit(root: String, version: String,
      retain: Int = RetainVersions,
      expectedBase: Option[String] = None): String = {
    failpoint(s"commit:$root")
    withCommitLock(root) {
      // CAS gate: the lineage is read INSIDE the critical section, so
      // the check and the pointer flip are one atomic step
      val cur = current(root)
      expectedBase.foreach { base =>
        if (!cur.contains(base))
          throw new ConcurrentCommitException(root, expectedBase, cur)
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
      val retained = (finalName +: history(root)
        .filterNot(_ == finalName)).take(math.max(1, retain))
      writePointer(root, retained)
      gc(root)
      // the COMMITTED name — may differ from `version` after a
      // renumber; callers that reference their own commit afterwards
      // (logging, CAS chains via expectedBase) must use this
      finalName
    }
  }

  /** Explicit history expiry — the index twin of the catalog's
    * expire-keep-N: truncate the retained lineage to `keep` versions
    * (min 1, the current) and GC everything outside it. Commit never
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

  /** Remove every version dir outside the retained lineage, plus
    * stage dirs abandoned longer than [[StageTtlMs]] — NEVER a fresh
    * stage dir, which may be a concurrent builder mid-build.
    */
  def gc(root: String): Unit = {
    val keep = history(root).toSet
    versionDirs(root).filterNot(f => keep.contains(f.getName))
      .foreach(Similarity.rmTree)
    val cutoff = System.currentTimeMillis() - StageTtlMs
    // abandonment = no write activity ANYWHERE in the stage tree for
    // the TTL. The top dir's own mtime is not enough: a build writing
    // under stage-vN/data/ never bumps stage-vN itself, and a
    // legitimate build longer than the TTL must not be reaped
    // mid-write. Cost: one metadata stat per file, same order as the
    // linkTree carry the commit just did.
    stageDirs(root).filter(newestMtime(_) < cutoff)
      .foreach(Similarity.rmTree)
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
    * leaves unchanged. Spark job-temp droppings (`_temporary`, `._*`)
    * are skipped; `_SUCCESS` markers link fine.
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
        java.nio.file.Files.createLink(to.toPath, from.toPath): Unit
    }
    walk(s, new java.io.File(dst))
  }

  /** Carry artifact `name` from the current version into a staged
    * version dir, if present (absent artifacts — e.g. no pending
    * tombstones — stay absent).
    */
  def carry(root: String, stagedDir: String, name: String): Unit =
    current(root).foreach { v =>
      linkTree(s"$root/$v/$name", s"$stagedDir/$name")
    }
}
