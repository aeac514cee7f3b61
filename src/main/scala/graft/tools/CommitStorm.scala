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
    // Transient-fault nemesis support (-Dgraft.storm.retryTransient):
    // under injected store throttling (MockS3FileSystem's
    // transientFaults) any protocol statement can fail LOUDLY with a
    // plain IOException. The recovery recipe an operator (or an SDK's
    // retry layer) runs is encoded here and certified by the nemesis
    // hostile loop, at the granularity real clients retry:
    //
    //   - idempotent statements (stage, artifact writes, reads)
    //     simply retry — the protocol's conditional creates make
    //     stage() converge on the same reservation;
    //   - commit() is NOT blindly retriable: a fault AFTER the
    //     publish (post-publish GC, prunes) leaves the commit
    //     durable, so the landed check runs FIRST and only a
    //     not-landed commit is retried — with the SAME staged version
    //     (finalizeVersion is replay-idempotent by design). Blind
    //     whole-round re-driving would double-apply post-publish
    //     faults and livelock under per-key fault injection.
    val retryTransient = sys.props.get("graft.storm.retryTransient")
      .exists(_ == "true")
    def retryIO[T](what: String)(body: => T): T = {
      var i = 0
      while (true) {
        try return body
        catch {
          case e: java.io.IOException if retryTransient && i < 100 =>
            i += 1
            println(s"[storm] $tag transient fault in $what " +
              s"(${e.getMessage}) — retrying")
        }
      }
      throw new IllegalStateException("unreachable")
    }
    def landedCheck(v: String): Boolean =
      retryIO("landed-check")(IndexManifest.history(root).contains(v))
    (0 until rounds).foreach { j =>
      var landed: String = null
      var staged: String = null
      while (landed == null) {
        val (v, dir) = retryIO("stage")(IndexManifest.stage(root))
        staged = v
        // schemed roots write the artifact through the store's own IO
        // (a mock-s3 root has no local path to reach around to);
        // plain posix roots keep the raw nio write
        retryIO("write") {
          if (isSchemed(dir))
            HadoopManifestIo.writeString(s"$dir/data", s"$tag-round-$j")
          else java.nio.file.Files.writeString(
            localPath(dir).resolve("data"), s"$tag-round-$j"): Unit
        }
        // retain everything: the parent asserts NO committed version
        // was lost from the lineage by any concurrently racing process
        var committing = true
        while (committing && landed == null) {
          try landed = IndexManifest.commit(root, v, retain = 1000)
          catch {
            case _: ConcurrentCommitException =>
              // a zombie stall lost to its takeover (or a CAS race):
              // the loud-loss contract — rebase and re-drive the round
              println(s"[storm] $tag round $j lost the race as $v " +
                "— rebasing")
              committing = false
            case e: java.io.IOException if retryTransient =>
              println(s"[storm] $tag round $j transient fault in " +
                s"commit (${e.getMessage}) — checking whether it landed")
              if (landedCheck(v)) {
                landed = v
                println(s"[storm] $tag round $j landed despite the " +
                  "fault (post-publish)")
              } // else: not landed — retry the commit, same version
          }
        }
      }
      println(s"[storm] $tag committed $landed (round $j)" +
        (if (landed != staged) s" [renumbered from $staged]" else ""))
    }
  }
}
