package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // 1 → 2, 1 → 3, 2 → 3; node 3 is DANGLING (no out-edges) — the case
  // the registered purchase-graph query cannot exercise (bidirectional
  // edges have no sinks).
  private def danglingEdges =
    Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")

  test("pageRank conserves probability mass with dangling nodes") {
    val pr = Graph.pageRank(danglingEdges, "src", "dst", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size == 3)
    val mass = pr.values.sum
    // dangling mass is redistributed, not lost: total stays 1
    assert(math.abs(mass - 1.0) < 1e-9, s"mass=$mass")
    // 3 receives from both 1 and 2 plus teleport+dangling: top rank
    assert(pr(3L) > pr(2L) && pr(2L) > pr(1L), pr.toString)
  }

  test("pageRank matches the hand-computed one-iteration star") {
    // star: 2,3,4 each → 1; 1 → 2 (so no dangling). N=4, d=0.85.
    // After 1 iter: pr(1) = 0.15/4 + 0.85*(3 * 0.25/1) = 0.675
    //              pr(2) = 0.15/4 + 0.85*(0.25/1)      = 0.25
    //              pr(3) = pr(4) = 0.15/4              = 0.0375
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L))
      .toDF("src", "dst")
    val pr = Graph.pageRank(edges, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr(1L) - 0.675) < 1e-12)
    assert(math.abs(pr(2L) - 0.25) < 1e-12)
    assert(math.abs(pr(3L) - 0.0375) < 1e-12)
    assert(math.abs(pr(4L) - 0.0375) < 1e-12)
  }

  test("distributed mode agrees with broadcast mode bit-for-bit") {
    // broadcastThreshold = 0 forces the keyed-join path on the same
    // dangling graph; per-edge terms and update arithmetic are shared,
    // so the two layouts must agree to summation-order noise
    val bc = Graph.pageRank(danglingEdges, "src", "dst", iters = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dist = Graph.pageRank(danglingEdges, "src", "dst", iters = 7,
        broadcastThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bc.keySet == dist.keySet)
    bc.foreach { case (id, v) =>
      assert(math.abs(v - dist(id)) < 1e-12, s"node $id: $v vs ${dist(id)}")
    }
  }

  test("null edge endpoints fall out instead of crashing either layout") {
    val dirty = Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(2L), None),
        (Some(2L), Some(1L)))
      .toDF("src", "dst")
    Seq(4000000L, 0L).foreach { bt =>
      val pr = Graph.pageRank(dirty, "src", "dst", iters = 2,
          broadcastThreshold = bt)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(pr.keySet == Set(1L, 2L), s"bt=$bt: ${pr.keySet}")
      assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    }
  }

  test("negative broadcastThreshold is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      Graph.pageRank(danglingEdges, "src", "dst", broadcastThreshold = -1L)
    }
    assert(e.getMessage.contains("broadcastThreshold"))
  }

  test("pageRank of an empty edge list is an empty frame, not a crash") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val pr = Graph.pageRank(empty, "src", "dst", iters = 3)
    assert(pr.columns.toSeq == Seq("id", "pr"))
    assert(pr.count() == 0L)
  }

  test("degrees counts directed in/out per node") {
    val d = Graph.degrees(danglingEdges, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(d == Set((1L, 2L, 0L), (2L, 1L, 1L), (3L, 0L, 2L)))
  }

  test("label propagation dense and distributed layouts agree exactly") {
    // broadcastThreshold = 0 forces the keyed-join path; the default
    // runs the dense packed-array rounds — integer labels must agree
    // bit-for-bit (same counts, same smallest-label tie-breaks)
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L), (3L, 10L), (20L, 21L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    for (iters <- Seq(1, 3)) {
      val dense = Graph.labelPropagation(edges, "src", "dst", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Graph.labelPropagation(edges, "src", "dst", iters,
          broadcastThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dense == dist, s"iters=$iters dense=$dense dist=$dist")
    }
  }

  test("label propagation drops null edge endpoints in both layouts") {
    val dirty = Seq((Some(1L), Some(2L)), (None, Some(3L)),
        (Some(2L), None), (Some(2L), Some(1L)))
      .toDF("src", "dst")
    Seq(4000000L, 0L).foreach { bt =>
      val got = Graph.labelPropagation(dirty, "src", "dst", iters = 2,
          broadcastThreshold = bt)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.keySet == Set(1L, 2L), s"bt=$bt: ${got.keySet}")
      // 1 and 2 point at each other: each adopts the other's label in
      // round 1, then back in round 2
      assert(got == Map(1L -> 1L, 2L -> 2L), s"bt=$bt: $got")
    }
  }

  test("label propagation equals the synchronous reference simulation") {
    // two cliques bridged by one edge; undirected = both directions
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L), (3L, 10L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    for (iters <- Seq(1, 2, 3)) {
      val got = Graph.labelPropagation(edges, "src", "dst", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // plain-Scala reference: synchronous rounds, most frequent
      // neighbor label, ties to the smallest label
      val adj = (und ++ und.map(_.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2)).toMap
      var ref = adj.keySet.map(v => v -> v).toMap
      (1 to iters).foreach { _ =>
        ref = ref.map { case (v, own) =>
          val counts = adj(v).groupBy(ref).view.mapValues(_.size)
          v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }
      assert(got == ref, s"iters=$iters got=$got ref=$ref")
    }
  }
}
