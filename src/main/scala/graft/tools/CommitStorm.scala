package graft.tools

import graft.llm.IndexManifest

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
  * No SparkSession: the manifest protocol is pure filesystem, and the
  * probe must be cheap enough to spawn several times in a spec.
  *
  * args: root writerTag rounds
  * exit 0 = all commits landed; any exception = nonzero.
  */
object CommitStorm {
  def main(args: Array[String]): Unit = {
    val Array(root, tag, roundsStr) = args
    val rounds = roundsStr.toInt
    (0 until rounds).foreach { j =>
      val (v, dir) = IndexManifest.stage(root)
      // a file:// root's stage dir is local disk under the scheme —
      // write the marker through the plain path
      val localDir = dir.stripPrefix("file://")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(localDir, "data"), s"$tag-round-$j"): Unit
      // retain everything: the parent asserts NO committed version was
      // lost from the lineage by any concurrently racing process
      val landed = IndexManifest.commit(root, v, retain = 1000)
      println(s"[storm] $tag committed $landed (round $j)" +
        (if (landed != v) s" [renumbered from $v]" else ""))
    }
  }
}
