package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Object-store certification of the manifest: index roots addressed
  * by SCHEME (`file://…` here, the same code path as `hdfs://`/
  * `s3a://`) run the REAL verbs end-to-end through
  * [[HadoopManifestIo]] — sequenced immutable `MANIFEST-<seq>` commit
  * files instead of a renamed pointer, stage-into-final-dir claims
  * instead of directory renames, a TTL lease instead of a
  * `FileChannel` lock, and the `listing` carry layout auto-pinned
  * (hard links poisoned throughout to prove the posix primitive is
  * never reached). Each lifecycle is value-compared against a plain
  * posix root built by the identical verbs.
  */
class HadoopManifestSpec extends SparkSpec {
  import spark.implicits._

  /** A schemed twin of a fresh temp dir: `file:///…/idx`. */
  private def schemedTemp(tag: String): (String, String) = {
    val plain = java.nio.file.Files.createTempDirectory(tag).toString
    (s"file://$plain/idx", s"$plain/idx")
  }

  private def poisonLinks[T](body: => T): T = {
    val prev = IndexManifest.linkFn
    IndexManifest.linkFn = (to, _) => throw new java.io.IOException(
      s"hard link attempted on an object-store root: $to")
    try body finally IndexManifest.linkFn = prev
  }

  /** The object-store shape invariants every lifecycle must hold:
    * no mutable `MANIFEST` pointer, no `stage-v*` dir ever left
    * behind, no multi-linked file, `listing` layout pinned, and a
    * bounded commit-file tail.
    */
  private def assertObjectStoreShape(local: String): Unit = {
    val names = new java.io.File(local).list().toSeq
    assert(!names.contains(IndexManifest.PointerFile),
      s"a mutable MANIFEST pointer appeared on a schemed root: $names")
    assert(names.exists(_.startsWith("MANIFEST-")),
      s"no sequenced commit files on a schemed root: $names")
    assert(!names.exists(_.startsWith("stage-")),
      s"a posix stage dir appeared on a schemed root: $names")
    assert(names.count(_.startsWith("MANIFEST-")) <=
      HadoopManifestIo.KeepCommitFiles,
      s"commit-file tail unbounded: ${names.filter(_.startsWith("MANIFEST-"))}")
    assert(IndexManifest.layoutOf(s"file://$local") ==
      IndexManifest.ListingLayout,
      "schemed root did not auto-pin the listing layout")
    def linked(f: java.io.File): Boolean =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).exists(linked)
      else java.nio.file.Files.getAttribute(f.toPath, "unix:nlink")
        .asInstanceOf[Number].intValue() > 1
    assert(!linked(new java.io.File(local)),
      "a hard-linked file appeared on a schemed root")
  }

  private def corpus = (0 until 60).map { i =>
    (i.toLong, s"w$i apple shared${i % 5} " +
      (if (i % 3 == 0) "banana" else "cherry"))
  }.toDF("doc_id", "text")

  private def bm25Serve(path: String) =
    Vocabulary.bm25Disk(spark, path, Seq("apple", "banana"),
        topK = 10, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("BM25 lifecycle (build/append/delete/compact/serve) on a " +
      "file:// root matches the posix root verbatim, link-free, " +
      "with sequenced commit files and no stage-dir renames") {
    val (root, local) = schemedTemp("hfs_bm25")
    val twin = java.nio.file.Files
      .createTempDirectory("hfs_bm25_twin").toString + "/idx"
    val docs = corpus
    poisonLinks {
      // link default in force: the schemed root must IGNORE it and
      // pin listing (links don't exist on object stores)
      Vocabulary.writeBm25Index(docs.filter(col("doc_id") < 40),
        "doc_id", "text", root, buckets = 4)
      Vocabulary.appendBm25Index(docs.filter(col("doc_id") >= 40),
        "doc_id", "text", root, buckets = 4)
      Vocabulary.deleteBm25Index(spark, root,
        (0 until 60 by 4).map(_.toLong))
      Vocabulary.compactBm25Index(spark, root, buckets = 4)
    }
    IndexManifest.withLayout(IndexManifest.ListingLayout) {
      Vocabulary.writeBm25Index(docs.filter(col("doc_id") < 40),
        "doc_id", "text", twin, buckets = 4)
      Vocabulary.appendBm25Index(docs.filter(col("doc_id") >= 40),
        "doc_id", "text", twin, buckets = 4)
      Vocabulary.deleteBm25Index(spark, twin,
        (0 until 60 by 4).map(_.toLong))
      Vocabulary.compactBm25Index(spark, twin, buckets = 4)
    }
    assert(bm25Serve(root) == bm25Serve(twin),
      "schemed-root BM25 lifecycle diverged from the posix twin")
    assertObjectStoreShape(local)
  }

  private def vecs = (0 until 240).map { i =>
    val a = i % 3
    val base = Array.tabulate(8)(j => if (j == a) 1.0 else 0.0)
    (i.toLong, base.map(_ + 0.01 * ((i * 7 + a) % 5)).toSeq)
  }.toDF("id", "vec")

  private def annServe(path: String) = {
    val query = Array.tabulate(8)(j => if (j == 0) 1.0 else 0.05)
    Similarity.topKAnnDisk(spark, path, query, dim = 8, bits = 4,
        tables = 4, k = 5, groups = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("LSH ANN lifecycle on a file:// root matches the posix root " +
      "verbatim and keeps the object-store shape invariants") {
    val (root, local) = schemedTemp("hfs_lsh")
    val twin = java.nio.file.Files
      .createTempDirectory("hfs_lsh_twin").toString + "/idx"
    val df = vecs
    def lifecycle(path: String): Unit = {
      Similarity.writeLshIndex(Similarity.multiTableIndex(
        df.filter(col("id") % 10 =!= 0), "vec", "id",
        dim = 8, bits = 4, tables = 4), path, groups = 8)
      Similarity.appendLshIndex(df.filter(col("id") % 10 === 0),
        "vec", "id", path, dim = 8, bits = 4, tables = 4, groups = 8)
      Similarity.deleteFromLshIndex(df.filter(col("id") < 3), "id", path)
      Similarity.compactLshIndex(spark, path)
    }
    poisonLinks { lifecycle(root) }
    IndexManifest.withLayout(IndexManifest.ListingLayout)(lifecycle(twin))
    assert(annServe(root) == annServe(twin),
      "schemed-root LSH lifecycle diverged from the posix twin")
    assertObjectStoreShape(local)
  }

  test("a crash before the pointer publish leaves the old version " +
      "serving bit-identically; the retry lands; commit files stay " +
      "immutable and bounded") {
    val (root, local) = schemedTemp("hfs_crash")
    val docs = corpus
    poisonLinks {
      Vocabulary.writeBm25Index(docs, "doc_id", "text", root, buckets = 4)
      val pre = bm25Serve(root)
      val preManifest = new java.io.File(local).list()
        .filter(_.startsWith("MANIFEST-")).sorted.toSeq
      val preContent = preManifest
        .map(n => java.nio.file.Files.readString(
          java.nio.file.Paths.get(local, n)))
      IndexManifest.failpoint = msg =>
        if (msg.contains(root)) throw new RuntimeException(
          s"injected crash before commit-file create: $msg")
      try {
        intercept[RuntimeException] {
          Vocabulary.appendBm25Index(docs.limit(0), "doc_id", "text",
            root, buckets = 4)
        }
      } finally IndexManifest.failpoint = _ => ()
      assert(bm25Serve(root) == pre,
        "a crashed append changed the served index on a schemed root")
      // already-published commit files are IMMUTABLE: the crash must
      // not have touched them
      preManifest.zip(preContent).foreach { case (n, c) =>
        assert(java.nio.file.Files.readString(
          java.nio.file.Paths.get(local, n)) == c,
          s"published commit file $n was mutated")
      }
      // the retry lands the delta on top
      Vocabulary.appendBm25Index(docs.filter(col("doc_id") === 0L),
        "doc_id", "text", root, buckets = 4)
      assert(IndexManifest.history(root).size == 2)
      assertObjectStoreShape(local)
    }
  }

  test("the commit lease blocks a racing commit while held, is taken " +
      "over once expired, and a released root commits normally") {
    val (root, local) = schemedTemp("hfs_lease")
    poisonLinks {
      val (v1, d1) = IndexManifest.stage(root)
      spark.range(1).write.parquet(s"$d1/data")
      IndexManifest.commit(root, v1): Unit

      // a LIVE foreign lease (deadline in the future) blocks commit
      val lease = java.nio.file.Paths.get(local, IndexManifest.LockFile)
      java.nio.file.Files.writeString(lease,
        s"foreign-holder\t${System.currentTimeMillis() + 60000}"): Unit
      val (v2, d2) = IndexManifest.stage(root)
      spark.range(1).write.parquet(s"$d2/data")
      val done = new java.util.concurrent.CountDownLatch(1)
      @volatile var err: Throwable = null
      val t = new Thread(() => {
        try IndexManifest.commit(root, v2): Unit
        catch { case x: Throwable => err = x }
        finally done.countDown()
      })
      t.start()
      Thread.sleep(400)
      assert(done.getCount == 1,
        "commit proceeded while a live foreign lease was held")
      assert(err == null, s"commit threw instead of waiting: $err")
      java.nio.file.Files.delete(lease) // holder releases
      assert(done.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "commit never acquired the lease after release")
      assert(err == null, s"commit failed after lease release: $err")
      assert(IndexManifest.history(root).head == v2)

      // an EXPIRED lease (crashed holder) is taken over without help
      java.nio.file.Files.writeString(lease,
        s"dead-holder\t${System.currentTimeMillis() - 1000}"): Unit
      val (v3, d3) = IndexManifest.stage(root)
      spark.range(1).write.parquet(s"$d3/data")
      IndexManifest.commit(root, v3): Unit
      assert(IndexManifest.history(root).head == v3,
        "commit did not take over an expired lease")
      assert(!java.nio.file.Files.exists(lease) ||
        !java.nio.file.Files.readString(lease).startsWith("dead-holder"),
        "the expired lease survived takeover")
      assertObjectStoreShape(local)
    }
  }

  test("a committed version name can NEVER be re-claimed: the claim " +
      "marker persists past commit, so a lagging stager that computed " +
      "the same number takes the next one instead of clobbering a " +
      "live version") {
    val (root, local) = schemedTemp("hfs_reclaim")
    poisonLinks {
      val (v1, d1) = IndexManifest.stage(root)
      spark.range(3).write.parquet(s"$d1/data")
      IndexManifest.commit(root, v1): Unit
      // the lagging stager's exact call: reserve the number a racer
      // already committed. Pre-fix this returned TRUE (the commit had
      // deleted the STAGE marker), handing the stager a live
      // pointer-referenced dir to write into — and its CAS-rebase
      // rmTree would then DELETE the current version
      assert(!HadoopManifestIo.reserveStage(root, v1),
        s"a committed version dir ($v1) was re-claimed as a stage")
      // the committed dir holds both markers and enumerates as a
      // VERSION, never a stage
      assert(new java.io.File(s"$local/$v1",
        HadoopManifestIo.StageMarkerFile).exists())
      assert(new java.io.File(s"$local/$v1",
        HadoopManifestIo.CommittedMarkerFile).exists())
      assert(HadoopManifestIo.listVersionDirNames(root) == Seq(v1))
      assert(HadoopManifestIo.listStageDirNames(root).isEmpty)
      // a real stager just moves on to the next free number
      val (v2, _) = IndexManifest.stage(root)
      assert(v2 != v1, s"stage() re-allocated the committed number $v1")
      // a LEGACY dir (pre-sentinel protocol: claim marker deleted at
      // commit) still counts as a version
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$local/$v1",
          HadoopManifestIo.StageMarkerFile))
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$local/$v1",
          HadoopManifestIo.CommittedMarkerFile))
      assert(HadoopManifestIo.listVersionDirNames(root).contains(v1),
        "a legacy committed dir (no markers) stopped counting as a version")
    }
  }

  test("lease takeover admits exactly one holder: contenders racing " +
      "over an expired lease from DIFFERENT in-process monitors " +
      "(alias roots) never overlap inside the critical section") {
    // two spellings of one root take different in-process monitors but
    // share the underlying lease files — mutual exclusion rests
    // entirely on the lease protocol, as it would across processes.
    // The pre-fix protocol took over by delete-then-recreate of ONE
    // shared name: contender B's delete could land on contender A's
    // fresh lease and admit both. Generation-numbered conditional
    // creates make any interleaving single-holder.
    val (root, local) = schemedTemp("hfs_alias")
    HadoopManifestIo.mkdirs(root)
    // trailing slash: a different in-process monitor key, the same
    // files (Hadoop Path collapses the duplicate separator)
    val alias = s"$root/"
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val overlaps = new java.util.concurrent.atomic.AtomicInteger(0)
    for (_ <- 0 until 25) {
      // seed a crashed holder's expired lease — both contenders see a
      // takeover opportunity at once
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(local, IndexManifest.LockFile),
        s"dead-holder\t${System.currentTimeMillis() - 1000}"): Unit
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val ts = Seq(root, alias).map { r =>
        val t = new Thread(() => {
          barrier.await()
          HadoopManifestIo.withLock(r) {
            if (inside.incrementAndGet() > 1) overlaps.incrementAndGet()
            Thread.sleep(15)
            inside.decrementAndGet()
          }
        })
        t.start(); t
      }
      ts.foreach(_.join(30000))
      assert(overlaps.get() == 0,
        "two contenders held the commit lease simultaneously")
    }
    // released cleanly: no lease file of any generation survives
    assert(!new java.io.File(local).list().exists(
      _.startsWith(IndexManifest.LockFile)),
      "a lease file leaked past release")
  }

  test("a ZOMBIE lease holder cannot drop its successor's commit: " +
      "publish is pinned to the token read at CAS time, so a holder " +
      "that outlives its lease loses loudly instead of publishing a " +
      "lineage missing the takeover's version") {
    val (root, local) = schemedTemp("hfs_zombie")
    poisonLinks {
      val (v1, d1) = IndexManifest.stage(root)
      spark.range(1).write.parquet(s"$d1/data")
      IndexManifest.commit(root, v1): Unit

      // token-level pin first (deterministic, no timing): a zombie's
      // read → a successor's commit → the zombie's publish. Pre-fix,
      // publishPointer re-listed and took the NEXT free sequence, so
      // the zombie's lineage (missing the successor's version)
      // published cleanly — the successor's commit silently vanished.
      val (histZ, tokenZ) = HadoopManifestIo.readPointerForCommit(root)
      val (v2, d2) = IndexManifest.stage(root)
      spark.range(1).write.parquet(s"$d2/data")
      IndexManifest.commit(root, v2): Unit
      intercept[ConcurrentCommitException] {
        HadoopManifestIo.publishPointer(root, "v99999" +: histZ, tokenZ)
      }
      assert(IndexManifest.current(root).contains(v2),
        "the zombie's stale publish displaced the successor's commit")

      // end-to-end: a commit stalled inside the critical section past
      // the lease TTL, a successor taking over and committing, then
      // the zombie waking to publish — it must throw, and the
      // successor's version must survive as current
      val prevTtl = HadoopManifestIo.LeaseTtlMs
      HadoopManifestIo.LeaseTtlMs = 400
      val stalled = new java.util.concurrent.atomic.AtomicBoolean(false)
      IndexManifest.failpoint = msg =>
        if (msg == s"publish:$root" && stalled.compareAndSet(false, true))
          Thread.sleep(3000) // outlive the lease mid-commit, once —
          // generous past the TTL so the successor's full takeover +
          // commit (+ suite-load noise) always lands inside the stall
      try {
        val (vz, dz) = IndexManifest.stage(root)
        spark.range(1).write.parquet(s"$dz/data")
        @volatile var zombieErr: Throwable = null
        val zombie = new Thread(() => {
          try IndexManifest.commit(root, vz): Unit
          catch { case t: Throwable => zombieErr = t }
        })
        zombie.start()
        // wait until the zombie is stalled INSIDE the lock, then let
        // its lease expire and commit over it from this thread. The
        // zombie holds the in-process monitor for `root`, so the
        // successor commits through an ALIAS spelling (same files,
        // different monitor key) — mutual exclusion rests on the
        // lease alone, as it would across processes
        while (!stalled.get()) Thread.sleep(10)
        Thread.sleep(500) // past LeaseTtlMs
        val (vs, ds) = IndexManifest.stage(s"$root/")
        spark.range(1).write.parquet(s"$ds/data")
        IndexManifest.commit(s"$root/", vs): Unit
        zombie.join(30000)
        assert(zombieErr != null &&
          zombieErr.isInstanceOf[ConcurrentCommitException],
          s"the zombie commit did not lose loudly: $zombieErr")
        assert(IndexManifest.current(root).contains(vs),
          "the zombie displaced the successor's commit")
        assert(IndexManifest.history(root).contains(vs))
      } finally {
        IndexManifest.failpoint = _ => ()
        HadoopManifestIo.LeaseTtlMs = prevTtl
      }
      assertObjectStoreShape(local)
    }
  }

  test("gc's reaps are lease-fenced: a holder that outlived its lease " +
      "skips every delete (a zombie's stale keep-set must never reap " +
      "a successor's freshly-committed version); a live holder reaps") {
    val (root, local) = schemedTemp("hfs_gcfence")
    poisonLinks {
      val (v1, d1) = IndexManifest.stage(root)
      spark.range(1).write.parquet(s"$d1/data")
      IndexManifest.commit(root, v1): Unit
      // an unreferenced version-shaped dir (crash between finalize and
      // publish): normally reaped by the very next gc
      val orphan = new java.io.File(s"$local/v00099")
      assert(orphan.mkdir())
      java.nio.file.Files.writeString(
        orphan.toPath.resolve(HadoopManifestIo.StageMarkerFile), "1"): Unit
      java.nio.file.Files.writeString(
        orphan.toPath.resolve(HadoopManifestIo.CommittedMarkerFile),
        "1"): Unit
      java.nio.file.Files.writeString(
        orphan.toPath.resolve("junk"), "x"): Unit
      val prevTtl = HadoopManifestIo.LeaseTtlMs
      HadoopManifestIo.LeaseTtlMs = 300
      try {
        HadoopManifestIo.withLock(root) {
          Thread.sleep(600) // outlive our own lease: we are the zombie
          IndexManifest.gc(root)
        }
        assert(orphan.isDirectory,
          "a zombie holder's gc reaped past its lapsed lease")
      } finally HadoopManifestIo.LeaseTtlMs = prevTtl
      // a live holder's gc reaps it
      HadoopManifestIo.withLock(root)(IndexManifest.gc(root))
      assert(!orphan.exists(),
        "a live holder's gc failed to reap an unreferenced version")
      assertObjectStoreShape(local)
    }
  }

  test("cross-PROCESS committers on a file:// root: three JVMs race " +
      "the generation lease and conditional-create commit files; " +
      "every version lands exactly once, no renumbering") {
    // the in-process monitor cannot serialize separate processes —
    // this contends the actual object-store primitives across JVMs:
    // lease takeover/acquire (generation conditional creates), stage
    // claims (persistent STAGE markers), and MANIFEST-<seq> publishes
    val (root, local) = schemedTemp("hfs_storm")
    val mainClasses = IndexManifest.getClass.getProtectionDomain
      .getCodeSource.getLocation.getPath
    val cp = s"$mainClasses:/opt/spark/jars/*"
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val writers = 3
    val rounds = 4
    val procs = (0 until writers).map { w =>
      val logFile = java.nio.file.Files
        .createTempFile(s"hstorm$w", ".log").toFile
      val p = new ProcessBuilder(javaBin, "-cp", cp,
          "graft.tools.CommitStorm", root, s"proc$w", rounds.toString)
        .redirectErrorStream(true)
        .redirectOutput(logFile).start()
      (p, logFile)
    }
    val logs = procs.map { case (p, logFile) =>
      val finished =
        p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
      if (!finished) p.destroyForcibly(): Unit
      val out = java.nio.file.Files.readString(logFile.toPath)
      assert(finished, s"hadoop storm JVM hung (killed)\n$out")
      assert(p.exitValue() == 0, s"hadoop storm JVM failed\n$out")
      out
    }
    val lineage = IndexManifest.history(root)
    assert(lineage.size == writers * rounds,
      s"a cross-process commit race dropped a committed version: " +
        s"${lineage.size} of ${writers * rounds} retained\n" +
        logs.mkString("\n"))
    // every (writer, round) landed exactly once, content intact, and
    // hadoop names NEVER renumber (claimed exactly once)
    assert(!logs.exists(_.contains("renumbered")),
      s"an object-store commit renumbered a claimed version:\n" +
        logs.mkString("\n"))
    val markers = lineage.map(v => java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$local/$v", "data")))
    assert(markers.distinct.size == markers.size)
    for (w <- 0 until writers; j <- 0 until rounds)
      assert(markers.contains(s"proc$w-round-$j"),
        s"lost proc$w-round-$j: $markers")
    // protocol shape held under cross-process contention: every dir
    // carries both markers, the commit tail is bounded, no lease leaks
    assertObjectStoreShape(local)
    lineage.foreach { v =>
      assert(new java.io.File(s"$local/$v",
        HadoopManifestIo.StageMarkerFile).exists(), s"$v lost its claim")
      assert(new java.io.File(s"$local/$v",
        HadoopManifestIo.CommittedMarkerFile).exists(),
        s"$v lost its commit sentinel")
    }
    assert(!new java.io.File(local).list().exists(
      _.startsWith(IndexManifest.LockFile)),
      "a lease generation leaked past the storm")
  }

  test("concurrent content-dependent mutations COMPOSE on a schemed " +
      "root: CAS rebase lands both deltas, never silently drops one") {
    val (root, _) = schemedTemp("hfs_cas")
    val df = vecs
    poisonLinks {
      Similarity.writeLshIndex(Similarity.multiTableIndex(
        df.filter(col("id") >= 6), "vec", "id",
        dim = 8, bits = 4, tables = 4), root, groups = 8)
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def run(body: => Unit): Thread = {
        val t = new Thread(() => {
          try { barrier.await(); body }
          catch { case x: Throwable => errs.add(x): Unit }
        })
        t.start(); t
      }
      // an append racing a tombstone delete: both must serve afterwards
      val tA = run(Similarity.appendLshIndex(
        df.filter(col("id") < 3), "vec", "id", root,
        dim = 8, bits = 4, tables = 4, groups = 8))
      val tB = run(Similarity.deleteFromLshIndex(
        Seq(33L, 42L).toDF("id"), "id", root))
      tA.join(120000); tB.join(120000)
      assert(errs.isEmpty, s"racing mutations failed: ${errs.peek()}")
      val served = annServe(root).map(_._1).toSet
      assert(Set(0L, 1L, 2L).subsetOf(
        Similarity.readLshIndex(spark, root).select("id")
          .collect().map(_.getLong(0)).toSet),
        "the racing append's delta was dropped")
      assert(!served.contains(33L) && !served.contains(42L),
        "the racing delete's tombstones were dropped")
    }
  }
}
