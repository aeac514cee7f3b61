package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 6

  /** Driver-side reference: argmax cosine, lowest id on ties, dirty →
    * 0, zero-norm centroids excluded.
    */
  private def reference(v: Seq[Double], cents: Array[Array[Double]]): Int = {
    if (v == null || v.length != dim) return 0
    val vn = math.sqrt(v.map(x => x * x).sum)
    if (vn == 0.0) return 0
    var best = -1
    var bestCos = Double.NegativeInfinity
    cents.zipWithIndex.foreach { case (c, i) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      if (cn > 0.0) {
        val cos = c.zip(v).map { case (a, b) => a * b }.sum / (cn * vn)
        if (cos > bestCos + 1e-12) { bestCos = cos; best = i }
      }
    }
    if (best < 0) 0 else best
  }

  test("fused expression equals the driver-side argmax on random data") {
    val rnd = new java.util.Random(11)
    val cents = Array.fill(9)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = (0L until 300L).map(i => i -> Seq.fill(dim)(rnd.nextGaussian()))
    val got = vecs.toDF("id", "vec")
      .select(col("id"),
        GraftFunctions.nearestCentroid(col("vec"), cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (i, v) =>
      assert(got(i) == reference(v, cents), s"row $i")
    }
  }

  test("dirty rows fall to cell 0; zero-norm centroids never win") {
    val cents = Array(
      Array.fill(dim)(0.0),               // dead cell 0
      Array(1.0, 0, 0, 0, 0, 0),
      Array(0.0, 1, 0, 0, 0, 0))
    val df = Seq(
      (1L, Seq(0.9, 0.1, 0, 0, 0, 0.0)),  // → cell 1
      (2L, Seq(0.1, 0.9, 0, 0, 0, 0.0)),  // → cell 2
      (3L, Seq(0.0, 0.0, 0, 0, 0, 0.0)),  // zero norm → 0
      (4L, Seq(1.0, 2.0)),                // wrong dim → 0
      (5L, null.asInstanceOf[Seq[Double]]) // null → null
    ).toDF("id", "vec")
    val rows = df.select(col("id"),
        GraftFunctions.nearestCentroid(col("vec"), cents).as("cell"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(rows(1L).contains(1))
    assert(rows(2L).contains(2))
    assert(rows(3L).contains(0))
    assert(rows(4L).contains(0))
    assert(rows(5L).isEmpty)
  }

  test("codegen path (parquet scan) agrees with the interpreted path") {
    // the local-relation tests above are evaluated interpreted
    // (ConvertToLocalRelation folds the projection); a parquet
    // round-trip forces a real scan and whole-stage codegen
    val rnd = new java.util.Random(17)
    val cents = Array.fill(5)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = (0L until 100L).map(i => i -> Seq.fill(dim)(rnd.nextGaussian()))
    val dir = java.nio.file.Files.createTempDirectory("ncent").toString + "/t"
    vecs.toDF("id", "vec").write.parquet(dir)
    val onDisk = spark.read.parquet(dir)
      .select(col("id"),
        GraftFunctions.nearestCentroid(col("vec"), cents).as("cell"))
    val plan = onDisk.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages in the short form
    assert(plan.contains("*(1) Project"),
      s"projection not inside a codegen stage:\n$plan")
    val got = onDisk.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (i, v) =>
      assert(got(i) == reference(v, cents), s"row $i codegen≠interpreted")
    }
  }
}
