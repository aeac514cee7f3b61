package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Graph analytics over derived relationship graphs (link graphs,
  * co-purchase graphs, near-duplicate graphs). Centrality scores are a
  * standard training-data curation signal — quality propagation over a
  * link graph ranks pages/documents the way OPIC/Common-Crawl-style
  * pipelines do — so PageRank joins `Dedup.connectedComponents` as a
  * first-class iterative operator.
  *
  * Scale shape (the 100 TB question): the EDGE list is always
  * distributed — it is materialized once (with out-degrees attached)
  * and scanned per iteration, never re-shuffled. The VERTEX state
  * (16 B/node) is orders of magnitude smaller; pageRank picks between
  * the two classic vertex-program layouts on a measured node count:
  * bounded vertex state rides a broadcast (one slim aggregation job
  * per iteration — the kmeansCentroids layout), unbounded vertex state
  * falls back to keyed joins with per-iteration checkpoints (the
  * connectedComponents layout, Dedup.scala:492).
  */
object Graph {

  /** Fixed-iteration PageRank over a directed edge list.
    *
    * rank'(v) = (1-d)/N + d * [ Σ_{u→v} rank(u)/outdeg(u) + dm/N ]
    *
    * where dm is the dangling mass (rank held by nodes with no
    * out-edges), redistributed uniformly. Node set = src ∪ dst. Fixed
    * iteration count (not convergence detection) keeps the result a
    * pure function of the input — exactly replayable by the unrolled
    * SQL oracle: both execution modes compute identical per-edge terms
    * (pr/outdeg) and identical per-node update arithmetic; only
    * summation order differs, which the caller's rounding absorbs.
    *
    * Mode selection: with ≤ `broadcastThreshold` nodes (default 4M ≈
    * 64 MB of vertex state) the rank vector is broadcast and each
    * iteration is ONE job — a map-side lookup join over the persisted
    * edge partitions into a slim (dst, partial-sum) aggregation whose
    * result (≤ n rows, bounded by the same threshold) returns to the
    * driver, the same bounded-collect contract as
    * `Similarity.kmeansCentroids`. Above the threshold every side
    * stays a DataFrame: rank-keyed hash joins, in-plan broadcast
    * dangling mass, per-iteration eager checkpoints.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5, damping: Double = 0.85,
      broadcastThreshold: Long = 4000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // The edge list feeds several consumers (out-degrees, node set,
    // per-iteration scans): persist it or the caller's whole edge
    // pipeline re-runs once per consumer (measured 4× a join+distinct
    // build on the purchase graph). Callers whose edge derivation fans
    // out (e.g. a union of both directions) should persist their own
    // upstream too.
    require(broadcastThreshold >= 0 && broadcastThreshold < Int.MaxValue,
      s"broadcastThreshold must be in [0, Int.MaxValue), got " +
        s"$broadcastThreshold (0 = always use the distributed layout)")
    // deserialized cache: the slim (src, dst) pairs are re-scanned once
    // per iteration, and SER-cache deserialization was the dominant
    // per-iteration cost at 1M+ edges (16 B/row — memory is not the
    // constraint here). Dirty rows (null endpoint) fall out rather than
    // crash the broadcast-mode driver arrays or become a phantom null
    // node in the distributed node set — the same null-out-don't-crash
    // policy as the similarity module.
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ONE pre-iteration job (single shuffle: node set and out-degrees
    // fold into the same aggregation) decides the mode AND (in the
    // common bounded case) delivers the whole vertex table: the limit
    // caps the fetch at threshold+1 rows, so an over-threshold graph
    // costs one spilled row, not an OOM, and falls to the distributed
    // layout
    val vFrame = e.select(col("src").as("id"), lit(1L).as("o"))
      .union(e.select(col("dst").as("id"), lit(0L).as("o")))
      .groupBy(col("id")).agg(sum(col("o")).as("outdeg"))
    val vrows = vFrame.limit(broadcastThreshold.toInt + 1).collect()

    val result =
      if (vrows.isEmpty)
        // empty edge list → empty ranks, composably (an upstream filter
        // can legitimately produce no edges; 1/n would be ∞ here)
        vFrame.select(col("id"), lit(0.0).as("pr")).where(lit(false))
      else if (vrows.length <= broadcastThreshold)
        prBroadcast(e, vrows, iters, damping)
      else prDistributed(e,
        vFrame.filter(col("outdeg") > 0)
          .select(col("id").as("src"), col("outdeg")),
        vFrame.count(), iters, damping, checkpointDir)
    e.unpersist()
    result
  }

  /** Bounded-vertex-state mode: ranks live in a per-iteration broadcast
    * array; edges are scanned map-side (no edge shuffle, no join).
    *
    * The vertex ids are held as a SORTED PRIMITIVE long array (8 B/node
    * broadcast — not a boxed Map's ~50+ B/entry, which at the 4M-node
    * threshold would be hundreds of MB per executor) and each edge is
    * packed ONCE into a per-partition `Array[Long]` of dense
    * (srcIdx<<32|dstIdx) indices via binary search. Iterations then
    * never touch Rows, codegen, or a shuffle: one `mapPartitions` job
    * accumulates a dense contribution vector per partition and
    * `treeReduce` sums them — per-iteration cost is pure primitive
    * array arithmetic plus one n-double broadcast of the per-node edge
    * weight pr/outdeg (the previous per-iteration closure `udf` +
    * boxed-map lookup + shuffled aggregation paid ~0.75 s/iteration in
    * plan fixed costs at ANY data size). Per-task transient memory is
    * one n-double vector — 32 MB at the 4M threshold, the same order
    * as the broadcast itself.
    */
  private def prBroadcast(e: DataFrame, vrows: Array[Row],
      iters: Int, damping: Double): DataFrame = {
    val spark = e.sparkSession
    val sc = spark.sparkContext
    val n = vrows.length.toLong
    val sorted = vrows.sortBy(_.getLong(0))
    val ids = sorted.map(_.getLong(0))
    val outdeg = sorted.map(_.getLong(1))
    val bcIds = sc.broadcast(ids)
    val packed = e.rdd.mapPartitions { rows =>
      val idArr = bcIds.value
      val buf = new scala.collection.mutable.ArrayBuilder.ofLong
      rows.foreach { r =>
        val si = java.util.Arrays.binarySearch(idArr, r.getLong(0))
        val di = java.util.Arrays.binarySearch(idArr, r.getLong(1))
        buf += (si.toLong << 32) | (di.toLong & 0xffffffffL)
      }
      Iterator.single(buf.result())
    }.persist(StorageLevel.MEMORY_AND_DISK)
    val nn = ids.length
    var pr = Array.fill(nn)(1.0 / n)
    var it = 0
    while (it < iters) {
      // per-edge term pr(src)/outdeg(src) precomputed per NODE on the
      // driver — identical arithmetic to the join form, executors only
      // read it by index
      val w = new Array[Double](nn)
      var dm = 0.0
      var i = 0
      while (i < nn) {
        if (outdeg(i) == 0L) dm += pr(i)
        else w(i) = pr(i) / outdeg(i)
        i += 1
      }
      val bcW = sc.broadcast(w)
      val contrib = packed.mapPartitions { arrs =>
        val wv = bcW.value
        val acc = new Array[Double](wv.length)
        arrs.foreach { arr =>
          var j = 0
          while (j < arr.length) {
            val p = arr(j)
            acc((p & 0xffffffffL).toInt) += wv((p >>> 32).toInt)
            j += 1
          }
        }
        Iterator.single(acc)
      }.treeReduce({ (a, b) =>
        var j = 0
        while (j < a.length) { a(j) += b(j); j += 1 }
        a
      }, depth = 2)
      val next = new Array[Double](nn)
      i = 0
      while (i < nn) {
        next(i) = (1.0 - damping) / n +
          damping * (contrib(i) + dm / n)
        i += 1
      }
      pr = next
      bcW.destroy()
      it += 1
    }
    packed.unpersist(false)
    // Result ships ONCE as a torrent broadcast, not as a parallelized
    // collection (which re-embeds all rows in every task binary on
    // every downstream action — a 6.9 MB task at sf1). Range-RDD tasks
    // carry only offsets; ~100k rows/partition so a threshold-sized
    // result (4M nodes) doesn't funnel through one task downstream.
    val bcPr = sc.broadcast(pr)
    val slices = math.max(1, ids.length / 100000)
    val rows = sc.range(0L, nn.toLong, 1L, slices).mapPartitions { idx =>
      val (idArr, prArr) = (bcIds.value, bcPr.value)
      idx.map(i => Row(idArr(i.toInt), prArr(i.toInt)))
    }
    spark.createDataFrame(rows,
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("pr", DoubleType, nullable = false))))
  }

  /** Unbounded-vertex-state mode: everything stays a DataFrame. The
    * adjacency (with out-degree attached) is persisted partitioned by
    * src; each iteration shuffles only the 16 B/row rank frame onto it,
    * the dangling mass is an in-plan broadcast one-row aggregate, and
    * each iteration is eagerly checkpointed so lineage stays
    * constant-depth (the connectedComponents idiom — and like CC, a
    * configured [[Checkpointing]] dir upgrades the rounds to RELIABLE
    * checkpoints that survive executor loss on a real cluster).
    */
  private def prDistributed(e: DataFrame, out: DataFrame, n: Long,
      iters: Int, damping: Double,
      checkpointDir: Option[String] = None): DataFrame = {
    // TWO materializer chains (the Checkpointing chain contract):
    // nodeSet is read by EVERY iteration, so it gets its own instance
    // (one write, never rotated); the ranks chain rotates — iteration
    // i only reads ranks(i-1)
    val materializePinned =
      Checkpointing.materializer(e.sparkSession, checkpointDir)
    val materialize = Checkpointing.materializer(e.sparkSession, checkpointDir)
    val adj = e.join(out, Seq("src"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val nodeSet = materializePinned(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct())
    var ranks = materialize(nodeSet.select(col("id"), lit(1.0 / n).as("pr")))
    var it = 0
    while (it < iters) {
      val contribs = adj
        .join(ranks.select(col("id").as("src"), col("pr")), Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") / col("outdeg")).as("contrib"))
        .select(col("dst").as("id"), col("contrib"))
      // rank mass sitting on sink nodes; one broadcast row
      val dangling = ranks
        .join(out.select(col("src").as("id")), Seq("id"), "left_anti")
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("dm"))
      ranks = materialize(nodeSet
        .join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + col("dm") / n)).as("pr")))
      it += 1
    }
    adj.unpersist()
    ranks
  }

  /** Per-node degree summary of a directed edge list: out-degree,
    * in-degree, total. One shuffle (union keyed by id). */
  /** Fixed-iteration SYNCHRONOUS label propagation — the
    * community-detection member of the graph family (Raghavan et al.
    * 2007, made deterministic): every node starts labeled with its own
    * id; each round every node adopts the most frequent label among
    * its neighbors, ties broken by SMALLEST label, all nodes updating
    * from the PREVIOUS round's labels (synchronous — no update-order
    * nondeterminism, unlike the classic asynchronous sweep). A fixed
    * iteration count keeps the result a pure function of the input,
    * exactly replayable by an unrolled SQL oracle — the same
    * determinism contract as [[pageRank]].
    *
    * The caller supplies the edge list with BOTH directions present
    * for an undirected graph (as with [[pageRank]]).
    *
    * Scale shape: per round, one join of the slim edge list against
    * the (id, lbl) frame, a (node, label) count aggregate, and a
    * per-node window cut whose partition size is the node's DISTINCT
    * NEIGHBOR LABEL count (≤ degree — bounded the way the minhash
    * window is, never corpus-wide). Label state is one long per node;
    * a run beyond a few rounds would add the per-iteration durable
    * checkpoints of [[pageRank]]'s distributed mode (rounds here are
    * fixed and few, so lineage stays bounded by construction).
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, broadcastThreshold: Long = 4000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(broadcastThreshold >= 0 && broadcastThreshold < Int.MaxValue,
      s"broadcastThreshold must be in [0, Int.MaxValue), got " +
        s"$broadcastThreshold (0 = always use the distributed layout)")
    val e = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Label state is one (long, long) row per node — the same dual
    // layout as [[pageRank]]/connectedComponents: with a BOUNDED node
    // set (≤ broadcastThreshold, 8 B/id = 32 MB at the default) the
    // rounds run on dense primitive arrays (labels broadcast per
    // round, edges packed once, one shuffle-free mapPartitions job per
    // round — the keyed-join loop pays ~1 s/round of join + double
    // aggregation + materialization plan fixed cost at ANY data
    // size); above it the keyed-join loop is the scale path. The
    // limit caps the mode probe's fetch at threshold+1 rows, so an
    // over-threshold graph costs one spilled row, not an OOM.
    var labels = e.select(col("a").as("id"))
      .union(e.select(col("b").as("id")))
      .distinct().withColumn("lbl", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val probe = labels.select(col("id"))
      .limit(broadcastThreshold.toInt + 1).collect()
    if (probe.length <= broadcastThreshold) {
      val result = lpDense(e, probe.map(_.getLong(0)), iters)
      labels.unpersist(blocking = false)
      e.unpersist()
      return result
    }
    (1 to iters).foreach { _ =>
      // winner pick as an AGGREGATE, not a window: max_by over the
      // (n, −lbl) struct is exactly "most frequent, smallest label on
      // ties" ((n, lbl) rows are unique per a, so the ordering key
      // never ties), aggregates partially map-side, and drops the
      // per-round exchange+sort a row_number window costs
      val picked = e
        .join(labels.select(col("id").as("b"), col("lbl")), "b")
        .groupBy(col("a"), col("lbl")).agg(count(lit(1)).as("n"))
        .groupBy(col("a"))
        .agg(max_by(col("lbl"),
          struct(col("n"), (-col("lbl")).as("neg"))).as("nl"))
        .select(col("a").as("id"), col("nl"))
      val prev = labels
      // persist per round: each round's frame feeds BOTH the neighbor
      // join and the carry-over — without it the lineage doubles per
      // iteration and the final action recomputes early rounds 2^k
      // times (longer runs would swap in the durable rotating
      // checkpoints of connectedComponents)
      labels = prev.join(picked, Seq("id"), "left")
        .select(col("id"), coalesce(col("nl"), col("lbl")).as("lbl"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      labels.count(): Unit
      prev.unpersist(blocking = false)
    }
    e.unpersist()
    labels
  }

  /** Bounded-vertex-state label propagation: node ids as a sorted
    * primitive long array, each edge packed ONCE into a dense
    * (dstIdx<<32|srcIdx) long and HASH-PARTITIONED BY dstIdx — every
    * node's incoming edges land wholly in one partition, so a round's
    * winner pick (most frequent neighbor label, smallest on ties) is
    * complete per partition and needs NO cross-partition merge of
    * (node, label) count state. Each round is then one shuffle-free
    * mapPartitions job over a per-round labels broadcast, collecting
    * ≤ 2·n longs of (nodeIdx, winner) pairs — the same bounded-collect
    * contract as [[pageRank]]'s broadcast mode. Same semantics as the
    * keyed-join loop (synchronous rounds, deterministic counts and
    * tie-breaks); edges stay DISTRIBUTED — only vertex state is
    * bounded. Caveat shared with any per-key gather: a single node of
    * extreme in-degree concentrates its edges in one partition (the
    * groupBy(dst) skew shape); the threshold gate bounds the vertex
    * state, not a hub's degree.
    */
  private def lpDense(e: DataFrame, idsIn: Array[Long],
      iters: Int): DataFrame = {
    val spark = e.sparkSession
    val sc = spark.sparkContext
    val ids = idsIn.clone()
    java.util.Arrays.sort(ids)
    val bcIds = sc.broadcast(ids)
    val nParts = math.max(1, e.rdd.getNumPartitions)
    val packed = e.rdd.mapPartitions { rows =>
      val idArr = bcIds.value
      rows.map { r =>
        val si = java.util.Arrays.binarySearch(idArr, r.getLong(0))
        val di = java.util.Arrays.binarySearch(idArr, r.getLong(1))
        (di, (di.toLong << 32) | (si.toLong & 0xffffffffL))
      }
    }.partitionBy(new org.apache.spark.HashPartitioner(nParts))
      .mapPartitions({ kvs =>
        val buf = new scala.collection.mutable.ArrayBuilder.ofLong
        kvs.foreach(kv => buf += kv._2)
        val arr = buf.result()
        java.util.Arrays.sort(arr) // groups runs by dstIdx (high bits)
        Iterator.single(arr)
      }, preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nn = ids.length
    var labels = ids.clone()
    var it = 0
    while (it < iters) {
      val bcL = sc.broadcast(labels)
      val winners = packed.mapPartitions { arrs =>
        val lv = bcL.value
        val out = new scala.collection.mutable.ArrayBuilder.ofLong
        var scratch = new Array[Long](64)
        arrs.foreach { arr =>
          var i = 0
          while (i < arr.length) {
            val d = (arr(i) >>> 32).toInt
            var len = 0
            while (i < arr.length && (arr(i) >>> 32).toInt == d) {
              if (len == scratch.length)
                scratch = java.util.Arrays.copyOf(scratch, len * 2)
              scratch(len) = lv((arr(i) & 0xffffffffL).toInt)
              len += 1; i += 1
            }
            // most frequent, ties to smallest: ascending scan with a
            // strict > keeps the first (= smallest) label on count ties
            java.util.Arrays.sort(scratch, 0, len)
            var best = scratch(0); var bestC = 0; var k = 0
            while (k < len) {
              var c = 1
              while (k + c < len && scratch(k + c) == scratch(k)) c += 1
              if (c > bestC) { bestC = c; best = scratch(k) }
              k += c
            }
            out += d.toLong
            out += best
          }
        }
        Iterator.single(out.result())
      }.collect()
      val next = labels.clone()
      winners.foreach { arr =>
        var i = 0
        while (i < arr.length) {
          next(arr(i).toInt) = arr(i + 1)
          i += 2
        }
      }
      labels = next
      bcL.destroy()
      it += 1
    }
    packed.unpersist(false)
    // result ships ONCE as a torrent broadcast over a range RDD — the
    // prBroadcast shape: tasks carry offsets, not embedded rows
    val bcLbl = sc.broadcast(labels)
    val slices = math.max(1, nn / 100000)
    val rows = sc.range(0L, nn.toLong, 1L, slices).mapPartitions { idx =>
      val (idArr, lblArr) = (bcIds.value, bcLbl.value)
      idx.map(i => Row(idArr(i.toInt), lblArr(i.toInt)))
    }
    spark.createDataFrame(rows,
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("lbl", LongType, nullable = false))))
  }

  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(col(srcCol).cast("long").as("id"), lit(1L).as("outd"),
        lit(0L).as("ind"))
      .union(edges.select(col(dstCol).cast("long").as("id"),
        lit(0L).as("outd"), lit(1L).as("ind")))
      .groupBy(col("id"))
      .agg(sum(col("outd")).as("out_degree"), sum(col("ind")).as("in_degree"))
}
