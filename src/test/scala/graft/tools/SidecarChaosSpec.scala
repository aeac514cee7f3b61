package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.SparkSpec
import graft.queries.Catalog

/** Chaos pass on the stamp-gated trained-model sidecars (IVF
  * centroids/radii, PQ codebooks): a torn build on disk must be
  * INVISIBLE — served queries rebuild and return the exact pre-chaos
  * answer, never torn data. Two failure shapes:
  *
  *  - a crash BETWEEN the parquet write and the stamp commit (the
  *    stamp is deleted before build and written only after save, so
  *    the torn artifact has no stamp) → stale/absent stamp → rebuild;
  *  - a TRUNCATED artifact under a matching stamp (torn replication,
  *    partial disk restore) → the load fails its read or validation
  *    and falls through to a rebuild.
  *
  * The sidecar paths replicate Catalog's dirTag derivation; if that
  * changes, the existence asserts below fail loudly rather than
  * testing nothing.
  */
class SidecarChaosSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"
  private val tag = d.replaceAll("[^A-Za-z0-9_]", "_")
    .replaceAll("_+", "_").stripPrefix("_")
  private val centroidsPath = s"/tmp/graft_centroids_$tag"
  private val pqPath = s"/tmp/graft_pqmodel_$tag"

  private def run(name: String): Seq[String] =
    Catalog.byName(name).run(spark, d).collect().map(_.toString)
      .sorted.toSeq

  /** Truncate every parquet part file under `dir` to its first half —
    * the footer (which parquet reads first) is destroyed.
    */
  private def truncateParts(dir: String): Int = {
    val parts = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
    parts.foreach { f =>
      val ch = java.nio.channels.FileChannel.open(f.toPath,
        StandardOpenOption.WRITE)
      try ch.truncate(math.max(1, f.length() / 2)) finally ch.close()
    }
    parts.length
  }

  test("truncated centroid sidecar under a matching stamp: the next " +
      "query rebuilds and serves the exact pre-chaos answer") {
    val before = run("sim_topk_ivf")
    assert(new java.io.File(centroidsPath).isDirectory &&
      new java.io.File(s"$centroidsPath.stamp").isFile,
      s"sidecar layout moved — expected $centroidsPath(.stamp); " +
        "update this spec's path derivation")
    Catalog.resetSharedArtifacts() // drop the in-memory copy
    assert(truncateParts(centroidsPath) > 0, "nothing truncated")
    val after = run("sim_topk_ivf")
    assert(after === before,
      "a torn centroid sidecar leaked into served results")
    // and the rebuild healed the sidecar: a fresh load succeeds
    Catalog.resetSharedArtifacts()
    assert(run("sim_topk_ivf") === before)
  }

  test("crash between sidecar write and stamp commit (no stamp): " +
      "rebuild, never serve the unstamped artifact") {
    val before = run("sim_topk_ivfpq")
    assert(new java.io.File(s"$pqPath/codebooks").isDirectory &&
      new java.io.File(s"$pqPath.stamp").isFile,
      s"sidecar layout moved — expected $pqPath/codebooks; " +
        "update this spec's path derivation")
    Catalog.resetSharedArtifacts()
    // simulate the crash window: artifacts present (here: torn, as a
    // real mid-write crash would leave them) and the stamp missing
    Files.delete(Paths.get(s"$pqPath.stamp"))
    truncateParts(s"$pqPath/codebooks"): Unit
    val after = run("sim_topk_ivfpq")
    assert(after === before,
      "an unstamped torn PQ sidecar leaked into served results")
    assert(new java.io.File(s"$pqPath.stamp").isFile,
      "the rebuild did not re-commit the stamp")
  }

  test("truncated PQ codebook sidecar under a matching stamp: " +
      "rebuild serves the exact pre-chaos answer") {
    val before = run("sim_topk_ivfpq")
    Catalog.resetSharedArtifacts()
    assert(truncateParts(s"$pqPath/codebooks") > 0, "nothing truncated")
    val after = run("sim_topk_ivfpq")
    assert(after === before,
      "a torn codebook sidecar leaked into served results")
  }

  test("stale stamp (fixture regenerated): the sidecar rebuilds " +
      "instead of serving the old model") {
    run("sim_topk_ivf"): Unit
    Catalog.resetSharedArtifacts()
    // a regenerated fixture changes sourceStamp; simulate by mutating
    // the recorded stamp — any mismatch must force a rebuild
    Files.writeString(Paths.get(s"$centroidsPath.stamp"),
      "stale-stamp-from-previous-fixture"): Unit
    val t0 = Files.getLastModifiedTime(
      Paths.get(s"$centroidsPath.stamp"))
    assert(run("sim_topk_ivf").nonEmpty)
    assert(Files.getLastModifiedTime(Paths.get(s"$centroidsPath.stamp"))
        .compareTo(t0) > 0,
      "a stale-stamped sidecar was served without rebuild")
  }
}
