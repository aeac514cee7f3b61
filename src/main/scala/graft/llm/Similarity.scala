package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (north-star surface).
  *
  * Two physical strategies for the same logical top-k-by-cosine:
  *
  *   - **brute force**: score every row with a pure-expression cosine
  *     (`aggregate` over `zip_with` — codegen'd) and `orderBy().limit(k)`
  *     — Spark plans TakeOrderedAndProject: per-partition heaps, only k
  *     rows per partition reach the driver. Exact; O(n) per query; the
  *     right baseline and the verifier for ANN recall.
  *   - **LSH (random hyperplanes)**: a deterministic signed-projection
  *     signature buckets vectors; a query probes its own bucket plus
  *     Hamming-1 neighbors. At 100 TB the bucketed table is
  *     pre-partitioned by signature so a probe touches only matching
  *     partitions, turning per-query cost from O(n) to O(n / 2^bits ·
  *     probes).
  */
object Similarity {

  /** Dot product of two array<double> columns — pure expression. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  /** Composable-expression cosine (higher-order functions). Kept as the
    * dependency-free reference form; the hot paths below use the native
    * codegen'd [[graft.functions.GraftFunctions.cosine]], which fuses
    * dot+norms into one allocation-free loop.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Native single-pass cosine (see CosineSimilarityExpr). */
  def cosineNative(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine(a, b)

  /** Exact top-k by cosine against a literal query vector. */
  def topKBrute(df: DataFrame, vecCol: String, idCol: String,
      query: Array[Double], k: Int): DataFrame = {
    val q = typedLit(query.toSeq)
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol), cosineNative(v, q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic random hyperplanes (seeded by plane index via the
    * same HMAC scheme as the encoder).
    */
  def hyperplanes(dim: Int, bits: Int, seedPrefix: String = "lsh"): Array[Array[Double]] =
    Array.tabulate(bits) { p =>
      val rnd = new java.util.Random(
        graft.encode.Deterministic.seedFor(s"$seedPrefix/$p"))
      Array.fill(dim)(rnd.nextGaussian())
    }

  /** Signature expression: bit p set iff dot(v, plane_p) ≥ 0. */
  def signature(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      when(dot(vec, typedLit(plane.toSeq)) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed index: (id, vec, sig). Persist + repartition by sig at
    * scale so probes prune partitions.
    */
  def lshIndex(df: DataFrame, vecCol: String, idCol: String,
      planes: Array[Array[Double]]): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol).as("id"), v.as("vec"),
      signature(v, planes).as("sig"))
  }

  /** Driver-side signature of one vector for one plane set (the same
    * bit rule as the [[signature]] expression).
    */
  def signatureOf(vec: Array[Double], planes: Array[Array[Double]]): Long =
    planes.zipWithIndex.map { case (plane, p) =>
      val d = plane.zip(vec).map { case (a, b) => a * b }.sum
      if (d >= 0) 1L << p else 0L
    }.sum

  /** ANN top-k: score only rows whose signature is within hamming
    * distance `probeHamming` of the query's signature (0 = own bucket,
    * 1 = own + all one-bit flips, …).
    */
  def topKAnn(index: DataFrame, query: Array[Double],
      planes: Array[Array[Double]], k: Int, probeHamming: Int = 1): DataFrame = {
    val qSig = signatureOf(query, planes)
    val q = typedLit(query.toSeq)
    index
      .filter(bit_count(col("sig").bitwiseXOR(lit(qSig))) <= probeHamming)
      .select(col("id"), cosineNative(col("vec"), q).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** Multi-table ANN top-k over a [[multiTableIndex]]: candidates are
    * the union over L tables of rows within `probeHamming` of the
    * query's per-table signature; exact cosine scores the DEDUPED
    * candidate set, then top-k. A single b-bit table misses a
    * moderately-similar neighbor with probability 1−p; the OR over L
    * tables cuts that to (1−p)^L — recall is bought with tables, at L×
    * index rows and ~L× probe cost, never coarser buckets. The dedup
    * shuffle carries only the candidate set (~O(k·L·bucket) rows), not
    * the corpus.
    */
  def topKAnnMultiTable(index: DataFrame, query: Array[Double],
      dim: Int, bits: Int, tables: Int, k: Int, probeHamming: Int = 1,
      seedPrefix: String = "lsh"): DataFrame = {
    val probe = (0 until tables).map { t =>
      val qSig = signatureOf(query, hyperplanes(dim, bits, s"$seedPrefix/t$t"))
      col("table") === lit(t) &&
        bit_count(col("sig").bitwiseXOR(lit(qSig))) <= probeHamming
    }.reduce(_ || _)
    val q = typedLit(query.toSeq)
    index.filter(probe)
      .select(col("id"), col("vec"))
      .dropDuplicates("id")
      .select(col("id"), cosineNative(col("vec"), q).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** All-pairs similarity join above a cosine threshold, restricted to
    * LSH buckets (same-signature pairs only) — the scale-safe shape of
    * "find all near-duplicate embeddings". Exact within a bucket.
    */
  def similarityJoin(index: DataFrame, threshold: Double): DataFrame = {
    val a = index.select(col("sig"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = index.select(col("sig"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineNative(col("vec_a"), col("vec_b")).as("score"))
      .filter(col("score") >= threshold)
  }

  /** Multi-table LSH: L independent plane sets. A single b-bit table
    * catches a pair of angle θ with probability (1−θ/π)^b — under 10%
    * for moderately-similar pairs — so real recall needs the OR over L
    * tables: 1−(1−p)^L. Candidates are the union of same-bucket pairs
    * across tables (dedup'd before scoring, so each pair is scored
    * once). Cost: L band rows per input row; still no all-pairs join.
    */
  def multiTableIndex(df: DataFrame, vecCol: String, idCol: String,
      dim: Int, bits: Int = 4, tables: Int = 8,
      seedPrefix: String = "lsh"): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val sigCols = (0 until tables).map { t =>
      val planes = hyperplanes(dim, bits, s"$seedPrefix/t$t")
      struct(lit(t).as("table"), signature(v, planes).as("sig")).as(s"s$t")
    }
    df.select(col(idCol).as("id"), v.as("vec"),
        explode(array(sigCols: _*)).as("ts"))
      .select(col("id"), col("vec"),
        col("ts.table").as("table"), col("ts.sig").as("sig"))
  }

  /** Near-dup pairs over a multi-table index: same (table, sig) bucket
    * in ANY table → candidate; exact cosine verifies.
    *
    * Order of operations matters at scale: candidate generation runs
    * over SLIM (table, sig, id) rows and pairs are deduped while still
    * 16 B each; only then do full vectors join on — from `source`, the
    * pre-explode frame, which holds exactly ONE copy of each vector. A
    * previous formulation reconstructed vectors from the exploded index
    * (`dropDuplicates("id")` over L copies per row), which shuffled the
    * whole corpus's vectors L× just to dedup them.
    */
  def similarityJoinMultiTable(index: DataFrame, source: DataFrame,
      vecCol: String, idCol: String, threshold: Double): DataFrame = {
    // candidates over slim (table, sig, id) rows; vectors join back onto
    // the DEDUPED pair list (same pattern as Dedup.nearDupPairs: payloads
    // must not ride through the explode/bucket join)
    val slim = index.select(col("table"), col("sig"), col("id"))
    val candidates = slim.select(col("table"), col("sig"), col("id").as("id_a"))
      .join(slim.select(col("table"), col("sig"), col("id").as("id_b")),
        Seq("table", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val vecs = source.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    candidates
      .join(vecs.select(col("id").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineNative(col("vec_a"), col("vec_b")).as("score"))
      .filter(col("score") >= threshold)
  }

  /** Bucket sizing rule: bits ≈ log2(n / targetBucketSize) — bucket
    * count tracks the corpus so per-bucket pair work stays constant;
    * recall is then bought with `tables`, not coarser buckets.
    */
  def bitsFor(n: Long, targetBucketSize: Int = 64): Int =
    math.max(4, math.ceil(
      math.log(math.max(n.toDouble / targetBucketSize, 2.0)) / math.log(2.0)).toInt)
}
