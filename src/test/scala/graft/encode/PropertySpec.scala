package graft.encode

import org.scalacheck.Gen

import graft.SparkSpec
import graft.relational.Zip

/** Property layer (SURVEY §5.2): invariants over scalacheck-generated
  * inputs. (The scalatest-scalacheck bridge isn't in the offline
  * dependency cache, so generators are sampled explicitly — a fixed
  * seed of cases per property, same coverage idea.)
  */
class PropertySpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    Iterator.continually(gen.sample).flatten.take(n).toSeq

  test("property: moments merge associativity — any partitioning gives global stats") {
    import spark.implicits._
    val gen = for {
      data <- Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6))
      parts <- Gen.choose(1, 8)
    } yield (data, parts)
    samples(gen, 15).foreach { case (data, parts) =>
      val n = data.size.toLong
      val mean = data.sum / n
      val variance = data.map(x => (x - mean) * (x - mean)).sum / n
      val df = spark.sparkContext.parallelize(data, parts).toDF("x")
      val s = Moments.compute(df, Seq("x"))("x")
      assert(s.n == n)
      assert(math.abs(s.mean - mean) <= 1e-6 * math.max(1.0, math.abs(mean)))
      assert(math.abs(s.stdPop - math.sqrt(variance)) <=
        1e-6 * math.max(1.0, math.sqrt(variance)))
    }
  }

  test("property: deterministic representation — same key same vector, unit RMS") {
    val gen = for {
      key <- Gen.alphaNumStr.suchThat(_.nonEmpty)
      dim <- Gen.choose(1, 64)
    } yield (key, dim)
    samples(gen, 50).foreach { case (key, dim) =>
      val a = Deterministic.representation(key, dim)
      val b = Deterministic.representation(key, dim)
      assert(a.toSeq == b.toSeq)
      assert(a.length == dim)
      val rms = math.sqrt(a.map(v => v * v).sum / dim)
      assert(math.abs(rms - 1.0) < 1e-9)
    }
  }

  test("property: encode width invariant for arbitrary schema values") {
    import spark.implicits._
    val rowGen = for {
      s <- Gen.alphaStr
      i <- Gen.choose(-1000, 1000)
      d <- Gen.choose(-1e3, 1e3)
    } yield (s, i, d)
    val gen = for {
      rows <- Gen.nonEmptyListOf(rowGen)
      dim <- Gen.choose(1, 16)
    } yield (rows, dim)
    samples(gen, 8).foreach { case (rows, dim) =>
      val df = rows.toDF("s", "i", "d")
      val state = Encoder.fit(df, Encoder.EncoderSpec(featureDim = dim))
      val out = Encoder.evalToDataframe(spark, df, state, "f").collect()
      assert(out.forall(_.getSeq[Double](0).length == dim))
    }
  }

  test("property: local zip transpose invariant") {
    val gen = for {
      rows <- Gen.choose(0, 20)
      cols <- Gen.choose(1, 5)
    } yield (rows, cols)
    samples(gen, 30).foreach { case (rows, cols) =>
      val seqs = (0 until cols).map(c => (0 until rows).map(r => r * cols + c))
      val zipped = Zip.zipLocal(seqs)
      assert(zipped.size == rows)
      zipped.zipWithIndex.foreach { case (row, r) =>
        assert(row == (0 until cols).map(c => r * cols + c))
      }
    }
  }
}
