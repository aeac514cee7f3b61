package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph analytics over derived relationship graphs (link graphs,
  * co-purchase graphs, near-duplicate graphs). Centrality scores are a
  * standard training-data curation signal — quality propagation over a
  * link graph ranks pages/documents the way OPIC/Common-Crawl-style
  * pipelines do — so PageRank joins `Dedup.connectedComponents` as a
  * first-class iterative operator.
  *
  * Scale shape (the 100 TB question): the adjacency is built ONCE, with
  * out-degree attached, and persisted hash-partitioned by `src` (the
  * build's last shuffle is the groupBy("src") degree join) — each
  * iteration then shuffles only the rank frame (16 B/row) onto it; the
  * edge payload never re-shuffles. Per-iteration lineage is truncated
  * with an eager localCheckpoint, the same idiom as
  * `Dedup.connectedComponents` (Dedup.scala:492), so the plan stays a
  * leaf scan regardless of iteration count.
  */
object Graph {

  /** Fixed-iteration PageRank over a directed edge list.
    *
    * rank'(v) = (1-d)/N + d * [ Σ_{u→v} rank(u)/outdeg(u) + dm/N ]
    *
    * where dm is the dangling mass (rank held by nodes with no
    * out-edges), redistributed uniformly. The dangling term is computed
    * IN-PLAN as a broadcast one-row aggregate — no driver action per
    * iteration; the whole loop runs `iters` Spark jobs (one per eager
    * checkpoint) plus the two build jobs.
    *
    * Node set = src ∪ dst of the edge list. Fixed iteration count (not
    * convergence detection) keeps the result a pure function of the
    * input — exactly replayable by the unrolled-SQL oracle.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val out = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg), partitioned by src — every iteration's
    // contribution join reuses this partitioning and shuffles only ranks
    val adj = e.join(out, Seq("src"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("pr"))
      .localCheckpoint(true)
    var it = 0
    while (it < iters) {
      val contribs = adj
        .join(ranks.select(col("id").as("src"), col("pr")), Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") / col("outdeg")).as("contrib"))
        .select(col("dst").as("id"), col("contrib"))
      // rank mass sitting on sink nodes; one broadcast row, zero rows
      // scanned twice (anti-join against the checkpointed rank leaf)
      val dangling = ranks
        .join(out.select(col("src").as("id")), Seq("id"), "left_anti")
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("dm"))
      ranks = nodes
        .join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + col("dm") / n)).as("pr"))
        .localCheckpoint(true)
      it += 1
    }
    adj.unpersist()
    ranks
  }

  /** Per-node degree summary of a directed edge list: out-degree,
    * in-degree, total. One shuffle (union keyed by id). */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(col(srcCol).cast("long").as("id"), lit(1L).as("outd"),
        lit(0L).as("ind"))
      .union(edges.select(col(dstCol).cast("long").as("id"),
        lit(0L).as("outd"), lit(1L).as("ind")))
      .groupBy(col("id"))
      .agg(sum(col("outd")).as("out_degree"), sum(col("ind")).as("in_degree"))
}
