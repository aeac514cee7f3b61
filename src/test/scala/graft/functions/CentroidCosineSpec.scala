package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CentroidCosineSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 6

  test("fused own-centroid cosine is BIT-identical to the composable form") {
    val rnd = new java.util.Random(23)
    val cents = Array.fill(9)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = (0L until 300L).map(i =>
      (i, Seq.fill(dim)(rnd.nextGaussian()), (i % 9).toInt))
    val df = vecs.toDF("id", "vec", "cell")
    val fused = df.select(col("id"),
        GraftFunctions.centroidCosine(col("vec"), col("cell"), cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // composable reference: the original cellRadii body — element_at
    // over k separate cosine expressions
    val cosines = array(cents.toIndexedSeq.map(c =>
      GraftFunctions.cosine(col("vec").cast("array<double>"),
        typedLit(c.toSeq))): _*)
    val ref = df.select(col("id"),
        element_at(cosines, col("cell") + 1).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vecs.foreach { case (i, _, _) =>
      assert(java.lang.Double.doubleToLongBits(fused(i)) ==
        java.lang.Double.doubleToLongBits(ref(i)), s"row $i: bit drift")
    }
  }

  test("null semantics: dirty vec, dead centroid, out-of-range cell") {
    val cents = Array(
      Array.fill(dim)(0.0),                 // dead cell 0
      Array(1.0, 0, 0, 0, 0, 0))
    val df = Seq(
      (1L, Seq(0.9, 0.1, 0, 0, 0, 0.0), 1), // fine
      (2L, Seq(0.9, 0.1, 0, 0, 0, 0.0), 0), // dead centroid → null
      (3L, Seq(0.0, 0.0, 0, 0, 0, 0.0), 1), // zero-norm row → null
      (4L, Seq(1.0, 2.0), 1),               // wrong dim → null
      (5L, Seq(0.9, 0.1, 0, 0, 0, 0.0), 7), // out of range → null
      (6L, null.asInstanceOf[Seq[Double]], 1) // null vec → null
    ).toDF("id", "vec", "cell")
    val rows = df.select(col("id"),
        GraftFunctions.centroidCosine(col("vec"), col("cell"), cents).as("c"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1L).isDefined && rows(1L).get > 0.9)
    Seq(2L, 3L, 4L, 5L, 6L).foreach(i => assert(rows(i).isEmpty, s"row $i"))
  }

  test("stays inside whole-stage codegen") {
    val cents = Array(Array.fill(dim)(1.0))
    // spark.range with an id-dependent vector (literal inputs
    // constant-fold the whole expression away — itself proof the expr
    // is fold-safe) so a codegen stage actually plans around it
    val df = spark.range(10)
      .select(col("id"),
        array(col("id").cast("double") +:
          Seq.fill(dim - 1)(lit(1.0)): _*).as("vec"),
        lit(0).as("cell"))
      .select(GraftFunctions.centroidCosine(col("vec"), col("cell"), cents)
        .as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // whole-stage codegen renders as "*(n)" stage markers
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(1)"), plan)
    assert(df.collect().forall(!_.isNullAt(0)))
  }
}
