package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Semantic (embedding-space) deduplication, SemDeDup-style
  * (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus embeddings,
  * then drop rows that have a near-identical neighbor WITHIN their
  * cluster — the pruning pass frontier-scale text pipelines run after
  * lexical dedup, because paraphrases and re-renders share no n-grams
  * but sit on top of each other in embedding space.
  *
  * The reference has no analogue (its DataFrame layer stops at feature
  * encoding, `TableOutput.java:1-120`); this is part of the
  * LLM-pipeline surface the engine adds.
  *
  * Determinism contract (what makes the operator oracle-replayable):
  *   - cluster SEEDS are the k corpus rows sorting first by
  *     `md5(cast(id as string))` — any engine with md5() picks the same
  *     rows, no RNG, no Lloyd iterations whose float trajectory would
  *     have to be replicated bit-for-bit;
  *   - ASSIGNMENT is argmax cosine over the seed matrix, ties to the
  *     lowest seed rank ([[graft.functions.NearestCentroidExpr]]'s tie
  *     rule — one fused k×dim codegen pass, no per-seed expression);
  *   - the DROP RULE is "row r is a duplicate iff some row q in the
  *     same cluster has id < r.id and cosine(q, r) ≥ threshold" — an
  *     EXISTS, not a greedy chain, so it needs no sequential sweep and
  *     replays as a plain semi join in SQL.
  *
  * Scale shape: assignment is one broadcast-matrix scan (k·dim doubles
  * ride the closure; no shuffle). The pair search shuffles each row
  * ONCE on its cluster id and compares only within-cluster — with
  * k ≈ n / targetClusterSize the candidate volume is n·targetCluster
  * instead of n², which is the entire SemDeDup bargain. Oversized
  * clusters are ordinary join skew: AQE's skew split handles them, or
  * raise k (the paper runs k ≈ √n). The duplicate-id list is a slim
  * id-only frame that broadcast-anti-joins back — surviving rows never
  * shuffle.
  */
object SemDedup {

  /** The k seed medoids in md5-rank order: (id, vector) pairs. Bounded
    * driver collect — k rows, k ≪ corpus.
    */
  def seedMedoids(df: DataFrame, vecCol: String, idCol: String,
      k: Int): Array[(Long, Array[Double])] = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .orderBy(md5(col("id").cast("string")))
      .limit(k)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
  }

  /** (id, v, cluster) — cluster is the SEED ID (not its rank), so the
    * label survives seed-set evolution across corpus versions.
    */
  def assignClusters(df: DataFrame, vecCol: String, idCol: String,
      seeds: Array[(Long, Array[Double])]): DataFrame = {
    val cell = GraftFunctions.nearestCentroid(
      col("v"), seeds.map(_._2))
    df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      // element_at is 1-based; nearestCentroid yields 0-based cell rank
      .withColumn("cluster",
        element_at(typedLit(seeds.map(_._1).toSeq), cell + lit(1)))
  }

  /** Survivors of cluster-scoped semantic dedup: (id, cluster) for every
    * row with NO smaller-id within-cluster neighbor at ≥ threshold.
    */
  def semanticDedup(df: DataFrame, vecCol: String, idCol: String,
      k: Int, threshold: Double): DataFrame = {
    val assigned = assignClusters(df, vecCol, idCol,
      seedMedoids(df, vecCol, idCol, k))
    val a = assigned.select(col("cluster").as("cl_a"),
      col("id").as("id_a"), col("v").as("va"))
    val b = assigned.select(col("cluster").as("cl_b"),
      col("id").as("id_b"), col("v").as("vb"))
    // duplicates = rows with a smaller-id near neighbor in-cluster.
    // Equi-join on cluster; the id ordering and cosine threshold ride
    // as join filters, so the shuffle key stays the cluster id.
    val dupIds = b.join(a,
        col("cl_b") === col("cl_a") && col("id_a") < col("id_b") &&
          GraftFunctions.cosine(col("va"), col("vb")) >= threshold,
        "left_semi")
      .select(col("id_b").as("id"))
    assigned.join(broadcast(dupIds), Seq("id"), "left_anti")
      .select(col("id"), col("cluster"))
  }
}
