package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Similarity

class HyperplaneSignatureSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val planes = Similarity.hyperplanes(dim, bits = 6)

  test("native signature equals driver-side signatureOf on every row") {
    val rnd = new java.util.Random(3)
    val vecs = (0L until 200L).map(i => i -> Seq.fill(dim)(rnd.nextGaussian()))
    val df = vecs.toDF("id", "vec")
    val got = df.select(col("id"),
      Similarity.signature(col("vec"), planes).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (i, v) =>
      assert(got(i) == Similarity.signatureOf(v.toArray, planes),
        s"row $i signature mismatch")
    }
  }

  test("native signature equals the composable HOF form") {
    val rnd = new java.util.Random(5)
    val df = (0L until 100L).map(i => i -> Seq.fill(dim)(rnd.nextGaussian()))
      .toDF("id", "vec")
    val hof = planes.zipWithIndex.map { case (plane, p) =>
      when(Similarity.dot(col("vec"), typedLit(plane.toSeq)) >= 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val diff = df.select(
      (Similarity.signature(col("vec"), planes) =!= hof).as("d"))
      .filter(col("d")).count()
    assert(diff == 0)
  }

  test("dirty rows signature to null, not an exception") {
    val df = Seq(
      (1L, Seq.fill(dim)(1.0)),
      (2L, Seq(1.0, 2.0)), // wrong length
      (3L, null.asInstanceOf[Seq[Double]])
    ).toDF("id", "vec")
    val rows = df.select(col("id"),
      Similarity.signature(col("vec"), planes).as("sig"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows(1L).isDefined)
    assert(rows(2L).isEmpty)
    assert(rows(3L).isEmpty)
  }

  test("codegen and interpreted paths agree") {
    val rnd = new java.util.Random(9)
    val vec = Seq.fill(dim)(rnd.nextGaussian())
    val df = Seq(Tuple1(vec)).toDF("vec")
    // force interpreted: eval through a filter on a non-codegen context
    val sigCol = Similarity.signature(col("vec"), planes)
    val fromDf = df.select(sigCol.as("s")).collect().head.getLong(0)
    assert(fromDf == Similarity.signatureOf(vec.toArray, planes))
  }
}
