package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HYBRID sparse+dense retrieval — the RAG serving shape that neither
  * ranking family covers alone: BM25 finds exact-term matches
  * (identifiers, rare names) that embedding similarity smears out,
  * dense cosine finds paraphrases BM25 cannot see, and Reciprocal
  * Rank Fusion (Cormack et al., SIGIR'09) combines them using only
  * RANKS:
  *
  *   rrf(d) = Σ_lists 1 / (k0 + rank_list(d))
  *
  * Rank-only fusion is the production choice because the two score
  * scales (BM25 in nats vs cosine in [−1,1]) are incomparable and
  * any score-normalization constant would be corpus-dependent; k0=60
  * is the paper's default.
  *
  * Scale shape: each list is produced by its own SCALE PATH (BM25 =
  * filter-before-explode slim postings, [[Vocabulary.bm25]]; dense =
  * one corpus scan with a TakeOrdered k-cut, [[Similarity.topKBrute]]
  * — swap in the disk ANN/IVF serve for build-once deployments, the
  * fusion is agnostic to how lists were produced). The fusion itself
  * then runs on two k-BOUNDED lists: the rank windows and the
  * full-outer join touch ≤ 2·nPerList rows total, so the "window
  * sort" here costs nothing at any corpus size — the anti-pattern is
  * windows over corpus-scale frames, not over result lists.
  *
  * Determinism: both lists rank on ROUNDED scores (BM25 is already
  * round(…,4); dense rounds to 6) with id tie-breaks, so ranks are
  * integers both engines agree on, and the RRF sum of two
  * 1/(60+rank) doubles from identical integers is bit-identical
  * cross-engine.
  */
object Retrieval {

  /** k-NN LABEL CLASSIFICATION over an embedding corpus — the
    * supervised application of the batch k-NN join (label propagation,
    * weak-label bootstrapping, embedding-space QA of labeled data):
    * each query row's predicted label is the MAJORITY vote of its k
    * nearest non-self neighbors (votes desc, label asc tiebreak).
    *
    * Self-exclusion without rank corruption: the join fetches k+1
    * neighbors, drops self-matches, and re-cuts to k — if self is in
    * the k+1 list (it ranks at/near the top: cos(q,q)=1) the remaining
    * top-k equals the top-k over the self-free corpus; if it is not,
    * the list already was self-free. Either way the result is exactly
    * "top-k excluding self", with no second corpus scan.
    *
    * Scale shape = [[Similarity.knnJoinBrute]] (one corpus scan,
    * bounded O(k) map-side partials); the vote aggregation and rank
    * windows run on q·(k+1) rows. Deterministic: ranks from
    * (score desc, id), votes argmax by (votes desc, label asc) via a
    * single max_by struct ordering.
    */
  def knnClassify(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queryFilter: Column, k: Int): DataFrame = {
    val queries = emb.filter(queryFilter)
    val neighbors = Similarity.knnJoinBrute(queries, emb, vecCol, idCol,
        k = k + 1)
      .filter(col("id") =!= col("query_id"))
    val recut = neighbors
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= k)
    val labels = emb.select(col(idCol).as("id"),
      col(labelCol).as("nbr_label"))
    val votes = recut.join(labels, Seq("id"))
      .groupBy(col("query_id"), col("nbr_label"))
      .agg(count(lit(1)).as("votes"))
    val pred = votes.groupBy(col("query_id"))
      .agg(max_by(col("nbr_label"),
        struct(col("votes"), negate(col("nbr_label").cast("long"))))
        .as("pred_label"))
    pred.join(
        queries.select(col(idCol).as("query_id"),
          col(labelCol).as("true_label")),
        Seq("query_id"))
      .select(col("query_id").as(idCol), col("pred_label"),
        col("true_label"))
  }

  /** Top-k fusion of BM25 and exact-cosine rankings over an aligned
    * (docs.idCol == emb.embIdCol) corpus. Returns
    * (idCol, rrf, sparse_rank, dense_rank) — ranks are null for a doc
    * present in only one list.
    */
  def hybridRrf(docs: DataFrame, idCol: String, textCol: String,
      emb: DataFrame, embIdCol: String, vecCol: String,
      queryTerms: Seq[String], queryVec: Array[Double],
      nPerList: Int = 50, k: Int = 10, k0: Int = 60): DataFrame = {
    // the fused candidate pool holds up to 2·nPerList docs; k merely
    // caps the output, so any positive combination is well-formed
    require(nPerList >= 1 && k >= 1 && k0 >= 0,
      s"need nPerList>=1, k>=1, k0>=0; got ($nPerList, $k, $k0)")
    val sparse = Vocabulary.bm25(docs, idCol, textCol, queryTerms,
        topK = nPerList)
      .select(col("id"),
        // bounded frame (<= nPerList rows post-topK): non-foldable
        // null-robust constant key (pmod∘hash — hash never returns
        // null) states intent, silences the WindowExec
        // single-partition warning in scale logs
        row_number().over(
          Window.partitionBy(pmod(hash(col("id")), lit(1)))
            .orderBy(col("score").desc, col("id")))
          .as("sparse_rank"))
    val dense = Similarity.topKBrute(emb, vecCol, embIdCol, queryVec,
        nPerList)
      .select(col(embIdCol).as("id"), round(col("score"), 6).as("ds"))
      .select(col("id"),
        row_number().over(Window.partitionBy(pmod(hash(col("id")), lit(1)))
            .orderBy(col("ds").desc, col("id")))
          .as("dense_rank"))
    def term(rank: Column): Column =
      coalesce(lit(1.0) / (lit(k0.toDouble) + rank.cast("double")),
        lit(0.0))
    sparse.join(dense, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        (term(col("sparse_rank")) + term(col("dense_rank"))).as("rrf0"),
        col("sparse_rank"), col("dense_rank"))
      .orderBy(col("rrf0").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("rrf0"), 6).as("rrf"),
        col("sparse_rank"), col("dense_rank"))
  }
}
