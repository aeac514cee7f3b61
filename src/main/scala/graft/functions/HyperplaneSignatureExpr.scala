package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: the full b-bit random-hyperplane LSH
  * signature of an `array<double>` vector in ONE fused pass.
  *
  * The composable form evaluates one interpreted higher-order `dot`
  * per plane — b array traversals per row through lambda interpreters.
  * This expression embeds the plane matrix as a codegen reference
  * object (`addReferenceObj` — no per-row literal decoding) and emits
  * a single dim×bits loop nest; bit p is set iff dot(v, plane_p) ≥ 0.
  * The index-build inner loop of every LSH table at 100 TB.
  *
  * Null semantics: null input → null; a vector whose length differs
  * from the planes' dimension → null (dirty row, not an exception);
  * null elements → null.
  */
final case class HyperplaneSignatureExpr(child: Expression,
    planes: Array[Array[Double]]) extends UnaryExpression {

  require(planes.nonEmpty && planes.forall(_.length == planes.head.length),
    "planes must be a non-empty rectangular matrix")
  require(planes.length <= 63, s"at most 63 bits per signature, got ${planes.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  @transient private lazy val flatPlanes: Array[Double] = planes.flatten
  private def bits: Int = planes.length
  private def dim: Int = planes.head.length

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var sig = 0L
    var p = 0
    while (p < bits) {
      var dot = 0.0
      var i = 0
      val off = p * dim
      while (i < dim) {
        if (v.isNullAt(i)) return null
        dot += flatPlanes(off + i) * v.getDouble(i)
        i += 1
      }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("graftPlanes", flatPlanes, "double[]")
      val sig = ctx.freshName("sig")
      val dot = ctx.freshName("dot")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val ok = ctx.freshName("ok")
      s"""
         |boolean $ok = $v.numElements() == $dim;
         |long $sig = 0L;
         |if ($ok) {
         |  outer:
         |  for (int $p = 0; $p < $bits; $p++) {
         |    double $dot = 0.0;
         |    int $off = $p * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      if ($v.isNullAt($i)) { $ok = false; break outer; }
         |      $dot += $planesRef[$off + $i] * $v.getDouble($i);
         |    }
         |    if ($dot >= 0) $sig |= (1L << $p);
         |  }
         |}
         |if (!$ok) { ${ev.isNull} = true; } else { ${ev.value} = $sig; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : HyperplaneSignatureExpr = copy(child = newChild)

  override def prettyName: String = "graft_hyperplane_signature"
}
