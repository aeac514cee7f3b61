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

  test("similarity join finds identical vectors in same bucket") {
    val vecs = randomVecs(20, 8) :+ (100L -> randomVecs(20, 8).head._2)
    val df = vecs.toDF("id", "vec")
    val planes = Similarity.hyperplanes(8, bits = 4)
    val index = Similarity.lshIndex(df, "vec", "id", planes)
    val pairs = Similarity.similarityJoin(index, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 100L)), s"identical pair missed: $pairs")
  }
}
