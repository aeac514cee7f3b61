package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: the cell id of the cosine-nearest
  * centroid for an `array<double>` vector, in ONE fused pass over a
  * k×dim matrix.
  *
  * The composable form ([[graft.llm.Similarity.nearestCell]]'s original
  * `array_min(array(struct(cos…)))`) plans k separate cosine
  * expressions per row — k array traversals plus a k-element
  * struct-array materialization per row, the dominant cost of every
  * IVF build/assign scan. This expression embeds the L2-NORMALIZED
  * centroid matrix as a codegen reference object and emits a single
  * k×dim loop nest; since rows are compared against unit-norm
  * centroids, argmax dot ≡ argmax cosine with no per-row norm.
  *
  * Semantics (matching the composable form):
  *   - null input → null
  *   - dirty row (length ≠ dim, null element, zero norm) → every
  *     cosine is undefined → cell 0 (the deterministic
  *     lowest-id fallback the composable form produced)
  *   - zero-norm CENTROIDS never win (their cosine is undefined);
  *     ties between real cells resolve to the lowest cell id
  */
final case class NearestCentroidExpr(child: Expression,
    centroids: Array[Array[Double]]) extends UnaryExpression {

  require(centroids.nonEmpty &&
    centroids.forall(_.length == centroids.head.length),
    "centroids must be a non-empty rectangular matrix")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${dt.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private def k: Int = centroids.length
  private def dim: Int = centroids.head.length

  /** Unit-normalized flat matrix; zero-norm rows flagged dead. */
  @transient private lazy val (flatNorm: Array[Double], dead: Array[Boolean]) = {
    val flat = new Array[Double](k * dim)
    val dd = new Array[Boolean](k)
    var c = 0
    while (c < k) {
      val row = centroids(c)
      val n = math.sqrt(row.map(x => x * x).sum)
      if (n == 0.0) dd(c) = true
      else {
        var i = 0
        while (i < dim) { flat(c * dim + i) = row(i) / n; i += 1 }
      }
      c += 1
    }
    (flat, dd)
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return 0
    var norm2 = 0.0
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return 0
      val x = v.getDouble(i)
      norm2 += x * x
      i += 1
    }
    if (norm2 == 0.0) return 0
    var best = -1
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      if (!dead(c)) {
        var dot = 0.0
        var j = 0
        val off = c * dim
        while (j < dim) { dot += flatNorm(off + j) * v.getDouble(j); j += 1 }
        if (dot > bestDot) { bestDot = dot; best = c }
      }
      c += 1
    }
    if (best < 0) 0 else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val matRef = ctx.addReferenceObj("graftCentroids", flatNorm, "double[]")
      val deadRef = ctx.addReferenceObj("graftDeadCells", dead, "boolean[]")
      val best = ctx.freshName("best")
      val bestDot = ctx.freshName("bestDot")
      val dot = ctx.freshName("dot")
      val norm2 = ctx.freshName("norm2")
      val ok = ctx.freshName("ok")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      s"""
         |int $best = 0;
         |boolean $ok = $v.numElements() == $dim;
         |double $norm2 = 0.0;
         |if ($ok) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($v.isNullAt($i)) { $ok = false; break; }
         |    double x = $v.getDouble($i);
         |    $norm2 += x * x;
         |  }
         |}
         |if ($ok && $norm2 > 0.0) {
         |  int $c = 0;
         |  double $bestDot = Double.NEGATIVE_INFINITY;
         |  $best = -1;
         |  for ($c = 0; $c < $k; $c++) {
         |    if ($deadRef[$c]) continue;
         |    double $dot = 0.0;
         |    int $off = $c * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += $matRef[$off + $i] * $v.getDouble($i);
         |    }
         |    if ($dot > $bestDot) { $bestDot = $dot; $best = $c; }
         |  }
         |  if ($best < 0) $best = 0;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : NearestCentroidExpr = copy(child = newChild)

  override def prettyName: String = "graft_nearest_centroid"
}
