package graft.tools

import graft.llm.{ConcurrentCommitException, HadoopManifestIo, IndexManifest}

/** Cross-PROCESS half of the concurrent index-writer certification:
  * stages and commits `rounds` versions against one shared index
  * root, each version's single artifact recording (writerTag, round).
  * Run as several simultaneous JVMs by ConcurrentIndexWriterSpec —
  * the in-process monitor cannot serialize separate processes, so
  * this path is what actually exercises the cross-process FileLock
  * on COMMIT_LOCK. A `file://`-schemed root routes through
  * `graft.llm.HadoopManifestIo` instead (HadoopManifestSpec's
  * storm): the contended primitives become the generation-numbered
  * commit lease and the conditional-create commit files.
  *
  * The two optional trailing args turn the hadoop storm HOSTILE:
  * `ttlMs` shrinks the commit lease so contention actually expires
  * leases mid-run, and `stallEvery` makes every Nth publish on this
  * process STALL past 2×TTL inside the critical section — a ZOMBIE
  * whose lease a live contender takes over. The zombie's commit must
  * then lose loudly (`ConcurrentCommitException` from the deadline
  * fence / commit-file CAS) and this process REBASES: re-stage,
  * re-write, re-commit, until the round lands. The parent asserts no
  * committed version was lost and every (writer, round) marker landed
  * exactly once — zero lost updates across takeover, publish-CAS and
  * GC-fence interleavings.
  *
  * No SparkSession: the manifest protocol is pure filesystem, and the
  * probe must be cheap enough to spawn several times in a spec.
  *
  * args: root writerTag rounds [ttlMs [stallEvery]]
  * exit 0 = all commits landed; any exception = nonzero.
  */
object CommitStorm {
  /** Local filesystem path of a possibly `file:`-schemed dir. URI
    * parse, not prefix-stripping: Hadoop renders the scheme as both
    * `file:///p` and `file:/p`, and `stripPrefix("file://")` passes
    * the second through as a bogus relative `file:` path.
    */
  private def isSchemed(dir: String): Boolean =
    dir.matches("^[A-Za-z][A-Za-z0-9+.\\-]*:/.*")

  private def localPath(dir: String): java.nio.file.Path =
    if (isSchemed(dir))
      java.nio.file.Paths.get(new java.net.URI(dir).getPath)
    else java.nio.file.Paths.get(dir)

  def main(args: Array[String]): Unit = {
    val root = args(0)
    val tag = args(1)
    val rounds = args(2).toInt
    args.lift(3).foreach(t => HadoopManifestIo.LeaseTtlMs = t.toLong)
    val stallEvery = args.lift(4).map(_.toInt).getOrElse(0)
    if (stallEvery > 0) {
      val publishes = new java.util.concurrent.atomic.AtomicInteger(0)
      IndexManifest.failpoint = msg =>
        if (msg.startsWith("publish:") &&
            publishes.incrementAndGet() % stallEvery == 0) {
          println(s"[storm] $tag stalling past the lease TTL (zombie)")
          Thread.sleep(HadoopManifestIo.LeaseTtlMs * 2 + 200)
        }
    }
    (0 until rounds).foreach { j =>
      var landed: String = null
      var staged: String = null
      while (landed == null) {
        val (v, dir) = IndexManifest.stage(root)
        staged = v
        // schemed roots write the artifact through the store's own IO
        // (a mock-s3 root has no local path to reach around to);
        // plain posix roots keep the raw nio write
        if (isSchemed(dir))
          HadoopManifestIo.writeString(s"$dir/data", s"$tag-round-$j")
        else java.nio.file.Files.writeString(
          localPath(dir).resolve("data"), s"$tag-round-$j"): Unit
        // retain everything: the parent asserts NO committed version
        // was lost from the lineage by any concurrently racing process
        try landed = IndexManifest.commit(root, v, retain = 1000)
        catch {
          case _: ConcurrentCommitException =>
            // a zombie stall lost to its takeover (or a CAS race):
            // the loud-loss contract — rebase and re-drive the round
            println(s"[storm] $tag round $j lost the race as $v — rebasing")
        }
      }
      println(s"[storm] $tag committed $landed (round $j)" +
        (if (landed != staged) s" [renumbered from $staged]" else ""))
    }
  }
}
