package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("hybridRrf fuses by rank with the 1/(k0+r) formula, " +
      "single-list docs score one term") {
    // corpus engineered so the two lists disagree: doc 1 wins BM25
    // (only hit for the rare term), doc 2 wins cosine, doc 3 appears
    // in both lists, doc 4 in neither
    val docs = Seq(
      (1L, "needle common common"),
      (2L, "common words only here"),
      (3L, "needle also here"),
      (4L, "nothing relevant at all")).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Seq(0.0, 1.0)),
      (2L, Seq(1.0, 0.0)),
      (3L, Seq(0.9, 0.1)),
      (4L, Seq(-1.0, 0.0))).toDF("vec_id", "embedding")
    val out = Retrieval.hybridRrf(docs, "doc_id", "text",
        emb, "vec_id", "embedding",
        queryTerms = Seq("needle"), queryVec = Array(1.0, 0.0),
        nPerList = 2, k = 4, k0 = 60)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toSeq
    // sparse list (bm25 on "needle", top-2): doc 1 (tf=1, dl=3) vs
    // doc 3 (tf=1, dl=3) — equal scores, id tiebreak → ranks 1, 3=2
    // dense list (cosine vs [1,0], top-2): doc 2 (1.0) rank 1,
    // doc 3 (~0.994) rank 2
    // rrf: doc3 = 1/62 + 1/62 ≈ 0.032258; doc1 = 1/61 ≈ 0.016393;
    //      doc2 = 1/61 ≈ 0.016393 (doc1 < doc2 by id); doc4 absent
    assert(out.map(_._1) == Seq(3L, 1L, 2L), s"order: $out")
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(3L)._3 == 2 && byId(3L)._4 == 2)
    assert(byId(1L)._3 == 1 && byId(1L)._4 == -1) // sparse-only
    assert(byId(2L)._3 == -1 && byId(2L)._4 == 1) // dense-only
    assert(math.abs(byId(3L)._2 - (1.0 / 62 + 1.0 / 62)) < 1e-6)
    assert(math.abs(byId(1L)._2 - 1.0 / 61) < 1e-6)
    // doc 4 is in neither list and must not appear
    assert(!out.exists(_._1 == 4L))
  }

  test("knnClassify majority-votes non-self neighbors with " +
      "deterministic tiebreaks") {
    // two tight clusters on the axes; query vec 0 sits in cluster A.
    // k=3 neighbors of vec 0 (excluding itself): vecs 1, 2 (label 7)
    // and the nearest B vector — majority label 7.
    val emb = Seq(
      (0L, Seq(1.0, 0.0), 7),
      (1L, Seq(0.99, 0.01), 7),
      (2L, Seq(0.98, 0.02), 7),
      (3L, Seq(0.0, 1.0), 9),
      (4L, Seq(0.01, 0.99), 9),
      (5L, Seq(0.02, 0.98), 9)).toDF("vec_id", "embedding", "label")
    val out = Retrieval.knnClassify(emb, "vec_id", "embedding", "label",
        queryFilter = col("vec_id").isin(0L, 3L), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .sortBy(_._1).toSeq
    assert(out == Seq((0L, 7, 7), (3L, 9, 9)), s"got $out")
    // self-exclusion matters: with k=5 each query sees 2 same-cluster
    // + 3 cross-cluster neighbors — NOT itself padding the majority
    val out5 = Retrieval.knnClassify(emb, "vec_id", "embedding", "label",
        queryFilter = col("vec_id") === 0L, k = 5)
      .collect().map(r => (r.getInt(1), r.getInt(2))).head
    // votes: label 7 ×2, label 9 ×3 → majority flips to 9
    assert(out5 == ((9, 7)), s"got $out5")
    // vote tie at k=4 (2 vs 2) → smaller label wins
    val out4 = Retrieval.knnClassify(emb, "vec_id", "embedding", "label",
        queryFilter = col("vec_id") === 0L, k = 4)
      .collect().map(_.getInt(1)).head
    assert(out4 == 7, s"tie should pick the smaller label, got $out4")
  }

  test("hybridRrf is deterministic and bounded by k") {
    val docs = (0 until 40).map(i =>
      (i.toLong, s"term$i needle shared")).toDF("doc_id", "text")
    val emb = (0 until 40).map(i =>
      (i.toLong, Seq(math.cos(i * 0.1), math.sin(i * 0.1))))
      .toDF("vec_id", "embedding")
    def run() = Retrieval.hybridRrf(docs, "doc_id", "text",
        emb, "vec_id", "embedding",
        queryTerms = Seq("needle"), queryVec = Array(1.0, 0.0),
        nPerList = 20, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val a = run()
    assert(a.length == 5)
    assert(a == run())
  }
}
