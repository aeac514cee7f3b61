package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SeqPackSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed packing: docs span chunk boundaries exactly") {
    // counts [3,4,2], L=4 → starts [0,3,7]; stream positions:
    // doc1: 0-2, doc2: 3-6, doc3: 7-8
    val df = Seq((1L, 3L), (2L, 4L), (3L, 2L)).toDF("id", "n")
    val got = SeqPack.packChunks(df, "id", "n", col("id"), 4L)
      .orderBy(col("chunk"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 2, 4L), (1L, 2, 4L), (2L, 1, 1L)))
  }

  test("bucket granularity never changes the result; invariants hold") {
    val docs = (1L to 500L).map(i => (i, 1L + (i * 7) % 50)).toDF("id", "n")
    val single = SeqPack.packChunks(docs, "id", "n", lit(0L), 128L)
      .orderBy(col("chunk")).collect().toSeq
    val bucketed = SeqPack.packChunks(docs, "id", "n",
        (col("id") / 37).cast("long"), 128L)
      .orderBy(col("chunk")).collect().toSeq
    assert(single == bucketed, "prefix sum must not depend on bucketing")
    val total = docs.agg(sum(col("n"))).collect().head.getLong(0)
    val chunks = single.map(r => (r.getLong(0), r.getLong(2)))
    assert(chunks.map(_._2).sum == total, "no token lost or duplicated")
    chunks.dropRight(1).foreach { case (c, n) =>
      assert(n == 128L, s"chunk $c must be full, got $n")
    }
    assert(chunks.map(_._1) == chunks.indices.map(_.toLong),
      "chunk ids must be dense from 0")
  }

  test("paddingReport: length-sorting collapses batch padding") {
    import org.apache.spark.sql.functions.col
    // arrival order alternates short/long → every batch of 2 pads the
    // short row to the long one; length-sorted pairs like with like
    val rows = Seq((1L, 10L), (2L, 100L), (3L, 10L), (4L, 100L))
      .toDF("id", "n")
    val got = SeqPack.paddingReport(rows, "id", "n", batchSize = 2)
      .orderBy(col("strategy"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // arrival: batches {10,100} ×2 → padding (2·100−110)·2 = 180
    // sorted: {10,10} and {100,100} → padding 0
    assert(got == Seq(("arrival", 2L, 220L, 180L),
      ("length_sorted", 2L, 220L, 0L)), s"got $got")
  }

  test("paddingReport two-phase rank ≡ local replay on random corpus") {
    import org.apache.spark.sql.functions.col
    // sparse non-dense ids + heavy length ties: exercises the
    // value-range bucketing and the (n, id) tie-break across buckets
    val rng = new scala.util.Random(7)
    val rows = (1 to 997).map { i =>
      (i * 131L + rng.nextInt(100), 1L + rng.nextInt(9).toLong)
    }.distinct.map { case (id, n) => (id, n) }
    val got = SeqPack.paddingReport(rows.toDF("id", "n"), "id", "n",
        batchSize = 32)
      .orderBy(col("strategy"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

    def replay(name: String, ordered: Seq[Long]): (String, Long, Long,
        Long) = {
      val batches = ordered.grouped(32).toSeq
      val pad = batches.map(b => b.size * b.max - b.sum).sum
      (name, batches.size.toLong, ordered.sum, pad)
    }
    val byId = rows.sortBy(_._1).map(_._2)
    val byLen = rows.sortBy(r => (r._2, r._1)).map(_._2)
    assert(got == Seq(replay("arrival", byId),
      replay("length_sorted", byLen)), s"got $got")
  }
}
