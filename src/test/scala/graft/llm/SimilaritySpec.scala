package graft.llm

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def randomVecs(n: Int, dim: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new java.util.Random(7)
    (0L until n.toLong).map(i => i -> Seq.fill(dim)(rnd.nextGaussian()))
  }

  test("cosine expression matches scala computation") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).collect()
      .head.getDouble(0)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got - expected) < 1e-12)
  }

  test("brute-force top-k returns exact nearest by cosine") {
    val vecs = randomVecs(100, 8)
    val df = vecs.toDF("id", "vec")
    val query = vecs(3)._2.toArray
    val got = Similarity.topKBrute(df, "vec", "id", query, 5)
      .collect().map(_.getLong(0)).toSeq
    // scala-side exact ranking
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = vecs.map { case (i, v) => i -> cos(v, query.toSeq) }
      .sortBy { case (i, s) => (-s, i) }.take(5).map(_._1)
    assert(got == expected)
    assert(got.head == 3L) // self is nearest
  }

  test("ann search achieves high recall vs brute force with 2-bit probes") {
    val vecs = randomVecs(500, 16)
    val df = vecs.toDF("id", "vec")
    val planes = Similarity.hyperplanes(16, bits = 6)
    val index = Similarity.lshIndex(df, "vec", "id", planes).cache()
    val queries = Seq(0, 17, 91).map(i => vecs(i)._2.toArray)
    val recalls = queries.map { q =>
      val brute = Similarity.topKBrute(df, "vec", "id", q, 10)
        .collect().map(_.getLong(0)).toSet
      val ann = Similarity.topKAnn(index, q, planes, 10, probeHamming = 2)
        .collect().map(_.getLong(0)).toSet
      brute.intersect(ann).size.toDouble / 10.0
    }
    index.unpersist()
    assert(recalls.sum / recalls.size >= 0.5,
      s"mean ANN recall too low: $recalls")
  }

  test("ivf: kmeans centroids are deterministic and unit-norm") {
    val df = randomVecs(200, 8).toDF("id", "vec")
    val c1 = Similarity.kmeansCentroids(df, "vec", "id", k = 4, iters = 2)
    val c2 = Similarity.kmeansCentroids(df, "vec", "id", k = 4, iters = 2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    c1.foreach { c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
    }
  }

  test("ivf: cells partition the corpus; probing all cells is exact") {
    val vecs = randomVecs(300, 8)
    val df = vecs.toDF("id", "vec")
    val cents = Similarity.kmeansCentroids(df, "vec", "id", k = 4, iters = 2)
    val index = Similarity.ivfIndex(df, "vec", "id", cents).cache()
    assert(index.count() == 300) // every row lands in exactly one cell
    assert(index.select(col("cell")).distinct().count() <= 4)
    val q = vecs(42)._2.toArray
    val brute = Similarity.topKBrute(df, "vec", "id", q, 10)
      .collect().map(_.getLong(0)).toSeq
    val all = Similarity.topKIvf(index, q, cents, k = 10, nprobe = 4)
      .collect().map(_.getLong(0)).toSeq
    index.unpersist()
    assert(all == brute, "nprobe=cells must recover the exact answer")
  }

  test("ivf: top-k recall with partial probes on clustered data") {
    // clustered corpus (IVF's home turf): 4 well-separated gaussians
    val rnd = new java.util.Random(11)
    val centers = Seq.fill(4)(Array.fill(8)(rnd.nextGaussian() * 10))
    val vecs = (0L until 400L).map { i =>
      val c = centers((i % 4).toInt)
      i -> c.map(x => x + rnd.nextGaussian() * 0.3).toSeq
    }
    val df = vecs.toDF("id", "vec")
    val cents = Similarity.kmeansCentroids(df, "vec", "id", k = 4, iters = 3)
    val index = Similarity.ivfIndex(df, "vec", "id", cents).cache()
    val recalls = Seq(0, 13, 102).map { qi =>
      val q = vecs(qi)._2.toArray
      val brute = Similarity.topKBrute(df, "vec", "id", q, 10)
        .collect().map(_.getLong(0)).toSet
      val ivf = Similarity.topKIvf(index, q, cents, k = 10, nprobe = 1)
        .collect().map(_.getLong(0)).toSet
      brute.intersect(ivf).size / 10.0
    }
    index.unpersist()
    assert(recalls.sum / recalls.size >= 0.9,
      s"IVF recall too low on clustered data: $recalls")
  }

  test("ivf exact branch-and-bound equals brute force on isotropic data") {
    // isotropic gaussians are IVF's WORST case (cells barely separate) —
    // exactness must hold regardless
    val vecs = randomVecs(400, 8)
    val df = vecs.toDF("id", "vec")
    val cents = Similarity.kmeansCentroids(df, "vec", "id", k = 6, iters = 2)
    val index = Similarity.ivfIndex(df, "vec", "id", cents).cache()
    val radii = Similarity.cellRadii(index, cents)
    Seq(0, 57, 333).foreach { qi =>
      val q = vecs(qi)._2.toArray
      val brute = Similarity.topKBrute(df, "vec", "id", q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val exact = Similarity.topKIvfExact(index, q, cents, radii,
          k = 10, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(exact == brute, s"query $qi: exact IVF diverged from brute")
    }
    index.unpersist()
  }

  test("ivf exact: phase 2 prunes to nothing on well-separated clusters") {
    val rnd = new java.util.Random(23)
    val centers = Seq.fill(4)(Array.fill(8)(rnd.nextGaussian() * 10))
    val vecs = (0L until 400L).map { i =>
      val c = centers((i % 4).toInt)
      i -> c.map(x => x + rnd.nextGaussian() * 0.1).toSeq
    }
    val df = vecs.toDF("id", "vec")
    val cents = Similarity.kmeansCentroids(df, "vec", "id", k = 4, iters = 3)
    val index = Similarity.ivfIndex(df, "vec", "id", cents).cache()
    val radii = Similarity.cellRadii(index, cents)
    // tight clusters → small radii → strong bounds
    assert(radii.count(_ < 0.2) >= 3, s"radii not tight: ${radii.toSeq}")
    val q = vecs(8)._2.toArray
    val brute = Similarity.topKBrute(df, "vec", "id", q, 10)
      .collect().map(_.getLong(0)).toSeq
    val exact = Similarity.topKIvfExact(index, q, cents, radii,
        k = 10, nprobe = 1)
      .collect().map(_.getLong(0)).toSeq
    index.unpersist()
    assert(exact == brute)
  }

  test("multi-table ANN recall beats single-table and reaches >= 0.8") {
    val vecs = randomVecs(500, 16)
    val df = vecs.toDF("id", "vec")
    val queries = Seq(0, 17, 91, 200).map(i => vecs(i)._2.toArray)
    val bits = 4
    val multi = Similarity.multiTableIndex(df, "vec", "id", dim = 16,
      bits = bits, tables = 8).cache()
    val single = Similarity.lshIndex(df, "vec", "id",
      Similarity.hyperplanes(16, bits, "lsh/t0")).cache()
    val (multiRecalls, singleRecalls) = queries.map { q =>
      val brute = Similarity.topKBrute(df, "vec", "id", q, 10)
        .collect().map(_.getLong(0)).toSet
      val m = Similarity.topKAnnMultiTable(multi, q, dim = 16, bits = bits,
          tables = 8, k = 10)
        .collect().map(_.getLong(0)).toSet
      val s = Similarity.topKAnn(single,
          q, Similarity.hyperplanes(16, bits, "lsh/t0"), 10)
        .collect().map(_.getLong(0)).toSet
      (brute.intersect(m).size / 10.0, brute.intersect(s).size / 10.0)
    }.unzip
    multi.unpersist(); single.unpersist()
    val mMean = multiRecalls.sum / multiRecalls.size
    val sMean = singleRecalls.sum / singleRecalls.size
    assert(mMean >= 0.8, s"multi-table recall $multiRecalls")
    assert(mMean > sMean,
      s"multi-table ($mMean) must beat one table ($sMean)")
  }

  test("lsh signature is deterministic and bucket-bounded") {
    val vecs = randomVecs(50, 8)
    val df = vecs.toDF("id", "vec")
    val planes = Similarity.hyperplanes(8, bits = 4)
    val s1 = Similarity.lshIndex(df, "vec", "id", planes)
      .select("id", "sig").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = Similarity.lshIndex(df, "vec", "id", planes)
      .select("id", "sig").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == s2)
    assert(s1.values.forall(s => s >= 0 && s < 16))
  }

  test("multi-table LSH recall beats single-table on mid-similarity pairs") {
    // plant pairs at ~0.6 cosine: v and 0.6*v + 0.8*orthogonal
    val rnd = new java.util.Random(11)
    val base = (0 until 30).map(_ => Array.fill(16)(rnd.nextGaussian()))
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val planted = base.zipWithIndex.flatMap { case (v0, i) =>
      val u = unit(v0)
      val r = Array.fill(16)(rnd.nextGaussian())
      val proj = u.zip(r).map { case (a, b) => a * b }.sum
      val ortho = unit(r.zip(u).map { case (b, a) => b - proj * a })
      val partner = u.zip(ortho).map { case (a, o) => 0.6 * a + 0.8 * o }
      Seq((i.toLong * 2) -> u.toSeq, (i.toLong * 2 + 1) -> partner.toSeq)
    }
    val df = planted.toDF("id", "vec")
    val exactPairs = (0 until 30).map(i => (i.toLong * 2, i.toLong * 2 + 1)).toSet
    val multi = Similarity.multiTableIndex(df, "vec", "id", dim = 16,
      bits = 4, tables = 8)
    val found = Similarity
      .similarityJoinMultiTable(multi, df, "vec", "id", threshold = 0.55)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exactPairs.intersect(found).size.toDouble / exactPairs.size
    assert(recall >= 0.7, s"multi-table recall $recall too low")
    // single 4-bit table for comparison: should be clearly worse
    val single = Similarity.lshIndex(df, "vec", "id",
      Similarity.hyperplanes(16, bits = 4, "lsh/t0"))
    val foundSingle = Similarity.similarityJoin(single, threshold = 0.55)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallSingle = exactPairs.intersect(foundSingle).size.toDouble / exactPairs.size
    assert(recall > recallSingle, s"multi $recall !> single $recallSingle")
  }

  test("hyperplane probes: query-directed multiprobe set semantics") {
    import graft.functions.{GraftFunctions, HyperplaneProbesExpr}
    val dim = 16; val bits = 5; val t = 3
    val planes = Similarity.hyperplanes(dim, bits)
    val vecs = randomVecs(50, dim)
    val df = vecs.toDF("id", "vec")
    val got = df.select(col("id"),
        GraftFunctions.hyperplaneProbes(
          col("vec").cast("array<double>"), planes, t, 2).as("probes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    vecs.foreach { case (id, v) =>
      // scala reference: sig + flips of the t lowest-|margin| bits
      val dots = planes.map(p => p.zip(v).map { case (a, b) => a * b }.sum)
      val sig = dots.zipWithIndex
        .map { case (d, p) => if (d >= 0) 1L << p else 0L }.sum
      val chosen = dots.map(math.abs).zipWithIndex
        .sortBy { case (a, p) => (a, p) }.take(t).map(_._2).sorted
      val expected = Seq(sig) ++ chosen.map(i => sig ^ (1L << i)) ++
        (for { i <- chosen.indices; j <- (i + 1) until chosen.length }
          yield sig ^ (1L << chosen(i)) ^ (1L << chosen(j)))
      assert(got(id) == expected, s"id $id")
      assert(got(id).length == 1 + t + t * (t - 1) / 2)
      // interpreted eval path must agree with the codegen'd df path
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      val interp = HyperplaneProbesExpr(
          Literal.create(v, ArrayType(DoubleType)), planes, t, 2)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      assert(interp.toLongArray().toSeq == expected, s"interp id $id")
    }
    // dirty row (wrong dimension) probes to null, not an exception
    val dirty = Seq((0L, Seq(1.0, 2.0))).toDF("id", "vec")
    assert(dirty.select(GraftFunctions.hyperplaneProbes(
        col("vec").cast("array<double>"), planes, t, 2))
      .collect().head.isNullAt(0))
  }

  test("query-directed multiprobe join recalls planted mid-similarity pairs") {
    // same planted construction as the multi-table LSH test: pairs at
    // cosine 0.6, threshold 0.55
    val rnd = new java.util.Random(11)
    val base = (0 until 30).map(_ => Array.fill(16)(rnd.nextGaussian()))
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val planted = base.zipWithIndex.flatMap { case (v0, i) =>
      val u = unit(v0)
      val r = Array.fill(16)(rnd.nextGaussian())
      val proj = u.zip(r).map { case (a, b) => a * b }.sum
      val ortho = unit(r.zip(u).map { case (b, a) => b - proj * a })
      val partner = u.zip(ortho).map { case (a, o) => 0.6 * a + 0.8 * o }
      Seq((i.toLong * 2) -> u.toSeq, (i.toLong * 2 + 1) -> partner.toSeq)
    }
    val df = planted.toDF("id", "vec")
    val exactPairs = (0 until 30).map(i => (i.toLong * 2, i.toLong * 2 + 1)).toSet
    val found = Similarity.similarityJoinMultiProbe(df, "vec", "id",
        threshold = 0.55, dim = 16, bits = 4, tables = 8,
        flipBits = 3, probeHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exactPairs.intersect(found).size.toDouble / exactPairs.size
    assert(recall >= 0.9, s"query-directed multiprobe recall $recall too low")
    // every found pair must really clear the threshold (no false hits
    // survive exact rescoring)
    assert(found.forall { case (a, b) => a < b })
  }

  test("multiprobe join: small-corpus and at-scale plan paths agree") {
    // the dedup-vs-score ordering is a size-based plan choice keyed off
    // autoBroadcastJoinThreshold; force each path and require identical
    // output — the oracle must not be able to tell them apart
    val rnd = new java.util.Random(7)
    val vecs = (0 until 60).map(i =>
      i.toLong -> Array.fill(16)(rnd.nextGaussian()).toSeq)
    val df = vecs.toDF("id", "vec")
    def run(): Set[(Long, Long, Double)] =
      Similarity.similarityJoinMultiProbe(df, "vec", "id",
          threshold = 0.3, dim = 16, bits = 4, tables = 8,
          flipBits = 3, probeHamming = 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          BigDecimal(r.getDouble(2)).setScale(9,
            BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    val small = run() // local Seq-backed frame: broadcastable path
    val big =
      try { spark.conf.set(key, "-1"); run() } // forced at-scale path
      finally spark.conf.set(key, prev)
    assert(small == big,
      s"plan paths diverge: only-small=${small.diff(big).take(3)} " +
        s"only-big=${big.diff(small).take(3)}")
    assert(small.nonEmpty)
  }

  test("similarity join finds identical vectors in same bucket") {
    val vecs = randomVecs(20, 8) :+ (100L -> randomVecs(20, 8).head._2)
    val df = vecs.toDF("id", "vec")
    val planes = Similarity.hyperplanes(8, bits = 4)
    val index = Similarity.lshIndex(df, "vec", "id", planes)
    val pairs = Similarity.similarityJoin(index, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 100L)), s"identical pair missed: $pairs")
  }
  test("zero-norm centroid never captures rows (null cosine loses argmin)") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 0.0), Array(0.0, 1.0))
    val df = Seq((1L, Seq(0.9, 0.1)), (2L, Seq(0.1, 0.9)))
      .toDF("id", "vec")
    val cells = df.select(col("id"),
        Similarity.nearestCell(col("vec").cast("array<double>"), cents)
          .as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells(1L) == 0, s"row 1 assigned to ${cells(1L)}")
    assert(cells(2L) == 2, s"row 2 assigned to ${cells(2L)}")
  }

  test("kmeansCentroids survives dirty vectors of the wrong dimension") {
    val good = (0 until 40).map(i =>
      (i.toLong, Seq(math.cos(i * 0.3), math.sin(i * 0.3))))
    val dirty = Seq((1000L, Seq(1.0, 2.0, 3.0, 4.0)), (1001L, Seq(0.5)))
    val df = (good ++ dirty).toDF("id", "vec")
    // must not throw ArrayIndexOutOfBounds on the driver-side mean fill
    val cents = Similarity.kmeansCentroids(df, "vec", "id", k = 3, iters = 2)
    assert(cents.length == 3 && cents.forall(_.length == 2))
  }

  test("multiprobe join collapses exact-duplicate families: member " +
      "pairs complete, scores equal the representative pair's") {
    // 6 distinct base vectors, each replicated into a family of 4
    // bit-identical copies (ids interleaved so reps aren't contiguous)
    val rnd = new java.util.Random(11)
    val bases = (0 until 6).map(_ => Array.fill(16)(rnd.nextGaussian()))
    val rows = for {
      b <- bases.indices
      c <- 0 until 4
    } yield ((c * 6 + b).toLong, bases(b).toSeq)
    val df = rows.toDF("id", "vec")
    val found = Similarity.similarityJoinMultiProbe(df, "vec", "id",
        threshold = 0.2, dim = 16, bits = 4, tables = 8,
        flipBits = 3, probeHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byPair = found.map(t => (t._1, t._2) -> t._3).toMap
    assert(byPair.size == found.length, "duplicate output rows")
    assert(found.forall { case (a, b, _) => a < b }, "unordered pair ids")
    def fam(id: Long): Int = (id % 6).toInt
    // 1. WITHIN-family: all C(4,2)=6 member pairs per family, score 1.0
    for (b <- bases.indices) {
      val ids = (0 until 4).map(c => (c * 6 + b).toLong).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length) {
        val sc = byPair.get((ids(i), ids(j)))
        assert(sc.isDefined, s"missing within-family pair (${ids(i)},${ids(j)})")
        assert(math.abs(sc.get - 1.0) < 1e-9, s"within-family score $sc")
      }
    }
    // 2. CROSS-family: for every found cross pair, ALL 16 member combos
    // of the two families are present with the IDENTICAL score (bit-
    // for-bit — pure function of the two arrays)
    val crossFams = found.collect {
      case (a, b, s) if fam(a) != fam(b) =>
        (math.min(fam(a), fam(b)), math.max(fam(a), fam(b))) -> s
    }
    crossFams.groupBy(_._1).foreach { case ((fa, fb), hits) =>
      assert(hits.length == 16,
        s"family pair ($fa,$fb): ${hits.length} member combos, want 16")
      assert(hits.map(_._2).distinct.length == 1,
        s"family pair ($fa,$fb): member scores diverge")
    }
    // 3. every emitted score really clears the threshold, and every
    // score matches the exact cosine of the two base vectors
    def cos(x: Array[Double], y: Array[Double]): Double = {
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      d / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
    }
    found.foreach { case (a, b, s) =>
      assert(s >= 0.2, s"pair ($a,$b) below threshold: $s")
      assert(math.abs(s - cos(bases(fam(a)), bases(fam(b)))) < 1e-9,
        s"pair ($a,$b) score $s != exact cosine")
    }
  }

}
