package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.SparkSpec

/** The equivalence property behind routing IVF assignment through
  * [[NearestCentroidCoarseExpr]]: for EVERY input — random, tied,
  * dirty, degenerate — the coarse two-level search returns the
  * bit-identical cell id the exhaustive [[NearestCentroidExpr]]
  * returns. Correctness of the triangle-inequality pruning must not
  * depend on data distribution, so the fixtures include duplicated
  * centroids (exact ties), near-ties, dead (zero-norm) centroids, and
  * every dirty-row shape.
  */
class CoarseCentroidSpec extends SparkSpec {
  import spark.implicits._

  private def coarse(c: Column, cents: Array[Array[Double]]): Column =
    Bridge.column(NearestCentroidCoarseExpr(
      org.apache.spark.sql.catalyst.expressions.Cast(
        Bridge.expression(c),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)), cents))

  private def exhaustive(c: Column, cents: Array[Array[Double]]): Column =
    Bridge.column(NearestCentroidExpr(
      org.apache.spark.sql.catalyst.expressions.Cast(
        Bridge.expression(c),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)), cents))

  /** Both expressions over the same frame; assert cell-for-cell (and
    * null-for-null) equality.
    */
  private def assertEquivalent(df: org.apache.spark.sql.DataFrame,
      cents: Array[Array[Double]], label: String): Unit = {
    val rows = df
      .select(col("id"), exhaustive(col("vec"), cents).as("a"),
        coarse(col("vec"), cents).as("b"))
      .collect()
    assert(rows.nonEmpty, s"$label: empty fixture")
    rows.foreach { r =>
      val a = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val b = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(a == b, s"$label row ${r.get(0)}: exhaustive=$a coarse=$b")
    }
  }

  test("random centroids × random vectors, across the threshold sizes") {
    val rnd = new java.util.Random(42)
    val dim = 8
    for (k <- Seq(3, 64, 65, 200)) {
      val cents = Array.fill(k)(Array.fill(dim)(rnd.nextGaussian()))
      val vecs = (0L until 400L)
        .map(i => i -> Seq.fill(dim)(rnd.nextGaussian()))
      assertEquivalent(vecs.toDF("id", "vec"), cents, s"k=$k")
    }
  }

  test("exact ties (duplicated centroids) resolve to the same lowest id") {
    val rnd = new java.util.Random(7)
    val dim = 6
    val base = Array.fill(40)(Array.fill(dim)(rnd.nextGaussian()))
    // duplicate every 4th centroid later in the list (same direction,
    // different scale — cosine-identical), plus verbatim copies
    val cents = base ++ base.zipWithIndex.collect {
      case (c, i) if i % 4 == 0 => c.map(_ * 3.0)
    } ++ base.take(5)
    // inputs AT the duplicated centroids → exact maximal ties
    val atCents = base.zipWithIndex.collect {
      case (c, i) if i % 4 == 0 => i.toLong -> c.toSeq
    }
    val random = (1000L until 1200L)
      .map(i => i -> Seq.fill(dim)(rnd.nextGaussian()))
    assertEquivalent((atCents.toSeq ++ random).toDF("id", "vec"), cents,
      "ties")
  }

  test("dirty rows: wrong length, null element, zero vector, null input") {
    val rnd = new java.util.Random(3)
    val dim = 5
    val cents = Array.fill(80)(Array.fill(dim)(rnd.nextGaussian()))
    val df = Seq(
      (1L, Seq(1.0, 2.0)),                       // wrong dim
      (2L, Seq(0.0, 0.0, 0.0, 0.0, 0.0)),        // zero norm
      (3L, null.asInstanceOf[Seq[Double]]),      // null input
      (4L, Seq.fill(dim)(rnd.nextGaussian()))    // clean control
    ).toDF("id", "vec")
    assertEquivalent(df, cents, "dirty")
    // null ELEMENT needs an explicit nullable-element array
    val withNullElem = spark.sql(
      "SELECT 5L AS id, array(1.0D, CAST(NULL AS DOUBLE), 1.0D, 1.0D, 1.0D) AS vec")
    assertEquivalent(withNullElem, cents, "null-element")
  }

  test("dead centroids: mixed zero-norm rows, and ALL zero-norm") {
    val rnd = new java.util.Random(13)
    val dim = 4
    val mixed = Array.tabulate(90)(i =>
      if (i % 3 == 0) Array.fill(dim)(0.0)
      else Array.fill(dim)(rnd.nextGaussian()))
    val vecs = (0L until 200L).map(i => i -> Seq.fill(dim)(rnd.nextGaussian()))
    assertEquivalent(vecs.toDF("id", "vec"), mixed, "mixed-dead")
    // all-dead: ADVICE.md r11 — must return cell 0 per row, not throw
    // at group construction
    val allDead = Array.fill(70)(Array.fill(dim)(0.0))
    assertEquivalent(vecs.take(20).toDF("id", "vec"), allDead, "all-dead")
  }

  test("codegen path (parquet scan) agrees with interpreted, above threshold") {
    val rnd = new java.util.Random(29)
    val dim = 6
    val cents = Array.fill(120)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = (0L until 150L).map(i => i -> Seq.fill(dim)(rnd.nextGaussian()))
    val dir = java.nio.file.Files.createTempDirectory("coarse").toString + "/t"
    vecs.toDF("id", "vec").write.parquet(dir)
    val onDisk = spark.read.parquet(dir)
      .select(col("id"),
        GraftFunctions.nearestCentroid(col("vec"), cents).as("cell"))
    // the public routing function must have picked the coarse form
    assert(onDisk.queryExecution.analyzed.toString
        .contains("graft_nearest_centroid_coarse"),
      "k=120 should route through the coarse expression")
    val got = onDisk.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val interp = vecs.toDF("id", "vec")
      .select(col("id"), exhaustive(col("vec"), cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (i, _) =>
      assert(got(i) == interp(i), s"row $i codegen-coarse ≠ exhaustive")
    }
  }
}
