package graft.tools

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import graft.SparkSpec
import graft.queries.Catalog

/** A SparkSession is shared by concurrent callers in any real
  * deployment (notebook users, schedulers, a serving layer). The
  * catalog's query builders must therefore be re-entrant: no hidden
  * session-global state that one build corrupts for another. This spec
  * runs a mixed batch of oracle-checked queries in parallel threads on
  * the ONE shared session and requires byte-identical results to the
  * serial run.
  */
class ConcurrencySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val names = Seq(
    "q1_pricing_summary", "join_multiway", "window_topn_per_group",
    "text_stats", "dedup_exact", "agg_cube", "scalar_functions",
    "sql_cte_window",
    // round-6 additions with session-shared machinery: SQL session
    // variables (DECLARE/SET on the shared session), the memoized
    // component cache (split_leakfree + dedup_components race on one
    // computeIfAbsent build), and the driver-side PageRank loop
    "sql_variables", "split_leakfree", "dedup_components",
    "graph_pagerank", "dedup_lines",
    // round-7: graph_degrees + graph_pagerank race on the memoized
    // purchase-graph build (one computeIfAbsent localCheckpoint)
    "graph_degrees")

  private def run(name: String): Seq[String] =
    Catalog.byName(name).run(spark, sfDir)
      .collect().map(_.toString).toSeq

  test("concurrent catalog queries on one session match serial results") {
    val serial = names.map(n => n -> run(n)).toMap
    val rounds = 2
    (1 to rounds).foreach { _ =>
      val futs = names.map(n => Future(n -> run(n)))
      val parallel = Await.result(Future.sequence(futs), 180.seconds).toMap
      names.foreach { n =>
        assert(parallel(n) == serial(n),
          s"$n diverged under concurrency")
      }
    }
  }

  test("resetSharedArtifacts forces a rebuild that matches the cached run") {
    // the bench's re-time pass depends on this: dropping every memoized
    // artifact must change COST only, never results
    val memoized = Seq("graph_pagerank", "graph_degrees",
      "split_leakfree", "sim_topk_ivf", "sim_topk_pq")
    val before = memoized.map(n => n -> run(n)).toMap
    Catalog.resetSharedArtifacts()
    memoized.foreach { n =>
      assert(run(n) == before(n), s"$n diverged after artifact reset")
    }
  }
}
