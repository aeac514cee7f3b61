package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions

class PqSpec extends SparkSpec {
  import spark.implicits._

  private def randomVecs(n: Int, dim: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new java.util.Random(11)
    (0L until n.toLong).map(i => i -> Seq.fill(dim)(rnd.nextGaussian()))
  }

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("codebook training is deterministic and correctly shaped") {
    val df = randomVecs(200, 16).toDF("id", "vec")
    val m1 = Pq.trainCodebooks(df, "vec", "id", dim = 16, m = 4, k = 8,
      iters = 2)
    val m2 = Pq.trainCodebooks(df, "vec", "id", dim = 16, m = 4, k = 8,
      iters = 2)
    assert(m1.codebooks.length == 4)
    assert(m1.codebooks.forall(_.length == 8))
    assert(m1.codebooks.forall(_.forall(_.length == 4)))
    val flat1 = m1.codebooks.flatten.flatten.toSeq
    val flat2 = m2.codebooks.flatten.flatten.toSeq
    assert(flat1 == flat2) // byte-identical across runs
  }

  test("index packs one byte per subspace; dirty rows fall out") {
    val clean = randomVecs(50, 16)
    val dirty = Seq(
      1000L -> Seq.fill(7)(1.0),            // wrong dim
      1001L -> Seq.fill(16)(0.0))           // zero norm
    val df = (clean ++ dirty).toDF("id", "vec")
    val model = Pq.trainCodebooks(df, "vec", "id", dim = 16, m = 4, k = 8,
      iters = 1)
    val idx = Pq.pqIndex(df, "vec", "id", model)
    val rows = idx.collect()
    assert(rows.length == clean.length) // dirty rows excluded
    assert(rows.forall(_.getAs[Array[Byte]]("codes").length == 4))
    // null-element vectors null out at the encode expression itself
    val withNull = Seq((1L, Seq[java.lang.Double](1.0, null, 1.0, 1.0)))
      .toDF("id", "vec")
    val encoded = withNull.select(
      GraftFunctions.pqEncode(col("vec").cast("array<double>"),
        model.codebooks.map(_.map(_.take(1)))).as("c")).collect()
    assert(encoded.head.isNullAt(0))
  }

  test("adc score equals the lut sum and approximates true cosine") {
    val vecs = randomVecs(300, 32)
    val df = vecs.toDF("id", "vec")
    val model = Pq.trainCodebooks(df, "vec", "id", dim = 32, m = 8, k = 32,
      iters = 2)
    val idx = Pq.pqIndex(df, "vec", "id", model).persist()
    val query = vecs(5)._2.toArray
    val lut = Pq.adcLut(query, model)

    // ADC column matches a driver-side recomputation from the codes
    val got = idx.select(col("id"),
      GraftFunctions.pqAdc(col("codes"), lut, model.k).as("adc")).collect()
    got.foreach { r =>
      val codes = idx.filter(col("id") === r.getLong(0))
        .collect().head.getAs[Array[Byte]]("codes")
      val expect = codes.zipWithIndex.map { case (b, j) =>
        lut(j * model.k + (b & 0xff)) }.sum
      assert(math.abs(r.getDouble(1) - expect) < 1e-12)
    }

    // quantization error is bounded in aggregate (isotropic data is
    // PQ's worst case; the fixture probe measured mae ~0.05)
    val mae = got.map { r =>
      math.abs(r.getDouble(1) - cos(vecs(r.getLong(0).toInt)._2, query.toSeq))
    }.sum / got.length
    assert(mae < 0.15, s"ADC mean abs error $mae too large")
    idx.unpersist()
  }

  test("ivf-pq composes exact cell pruning with adc shortlisting") {
    // clustered corpus: 5 well-separated direction clusters — the
    // shape IVF pruning exists for
    val rnd = new java.util.Random(23)
    val centers = Seq.fill(5)(Seq.fill(16)(rnd.nextGaussian() * 3))
    val vecs: Seq[(Long, Seq[Double])] = (0L until 400L).map { i =>
      val c = centers((i % 5).toInt)
      i -> c.map(_ + rnd.nextGaussian() * 0.3)
    }
    val df = vecs.toDF("id", "vec")
    val model = Pq.trainCodebooks(df, "vec", "id", dim = 16, m = 4, k = 32,
      iters = 2)
    val cents = Similarity.kmeansCentroids(df, "vec", "id", k = 5, iters = 2)
    val index = Pq.ivfPqIndex(df, "vec", "id", cents, model).persist()
    assert(index.columns.toSet == Set("id", "cell", "codes"))
    val radii = Similarity.cellRadii(
      index.join(df.select(col("id"),
          col("vec").cast("array<double>").as("vec")), "id"),
      cents)
    val queries = Seq(7, 101, 203).map(i => vecs(i)._2.toArray)
    val recalls = queries.map { q =>
      val brute = Similarity.topKBrute(df, "vec", "id", q, 10)
        .collect().map(_.getLong(0)).toSet
      val got = Pq.topKIvfPq(index, df, "vec", "id", q, model, cents,
        radii, k = 10, nprobe = 2, shortlist = 100)
        .collect().map(_.getLong(0)).toSet
      brute.intersect(got).size / 10.0
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.9, s"ivfpq recall dropped to $avg (per-query $recalls)")
    index.unpersist()
  }

  test("rerank recovers the exact brute-force top-k on a shortlist") {
    val vecs = randomVecs(500, 32)
    val df = vecs.toDF("id", "vec")
    val model = Pq.trainCodebooks(df, "vec", "id", dim = 32, m = 8, k = 32,
      iters = 2)
    val idx = Pq.pqIndex(df, "vec", "id", model).persist()
    val queries = Seq(0, 123, 321).map(i => vecs(i)._2.toArray)
    val recalls = queries.map { q =>
      val brute = Similarity.topKBrute(df, "vec", "id", q, 10)
        .collect().map(_.getLong(0)).toSet
      val pq = Pq.topKRerank(idx, df, "vec", "id", q, model, 10,
        shortlist = 100).collect().map(_.getLong(0)).toSet
      brute.intersect(pq).size / 10.0
    }
    // 20% shortlist on isotropic data: the fixture probe measured 1.0;
    // pin ≥ 0.9 averaged so a genuine regression fails loudly
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.9, s"rerank recall dropped to $avg (per-query $recalls)")
    // and the final scores are EXACT cosines, not ADC approximations
    val q0 = queries.head
    val top = Pq.topKRerank(idx, df, "vec", "id", q0, model, 3,
      shortlist = 100).collect()
    top.foreach { r =>
      val want = cos(vecs(r.getLong(0).toInt)._2, q0.toSeq)
      assert(math.abs(r.getDouble(1) - want) < 1e-12)
    }
    idx.unpersist()
  }
}
