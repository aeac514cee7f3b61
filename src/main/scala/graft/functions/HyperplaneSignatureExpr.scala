package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

/** Query-directed multiprobe set (Lv et al., VLDB'07): the row's exact
  * signature plus every signature reachable by flipping up to `hamming`
  * of its `flipBits` LOWEST-|margin| bits — the planes the vector sits
  * closest to, which are exactly the bits most likely to differ from a
  * near neighbor's signature. Probing b=5/t=3/r=2 emits 7 signatures
  * where the full Hamming-≤2 neighborhood emits 16, at a per-table
  * catch of ~0.69 vs ~0.79 for cosine-0.5 pairs (measured, dim 64) —
  * recall per probe-row is what multiprobe buys, and the gap closes
  * under the symmetric pair-normalized join (either endpoint's probe
  * set may cover the differing bits). The probe count is FIXED at
  * 1 + t + C(t,2) while the full neighborhood grows as C(b,2) with
  * `bitsFor`-scaled b — at 100 TB (b≈20) that is 7 vs 211 rows per
  * index entry per table.
  *
  * One fused pass computes all dots; margin selection is an insertion
  * pass over a t-slot array (ties → lower plane index). The output
  * array is deterministic: exact signature first, then single flips of
  * the chosen bits in ascending plane order, then pair flips in
  * ascending (i, j) order.
  *
  * Null semantics match [[HyperplaneSignatureExpr]]: null input,
  * length-mismatched vector, or null element → null.
  */
final case class HyperplaneProbesExpr(child: Expression,
    planes: Array[Array[Double]], flipBits: Int, hamming: Int)
    extends UnaryExpression {

  require(planes.nonEmpty && planes.forall(_.length == planes.head.length),
    "planes must be a non-empty rectangular matrix")
  require(planes.length <= 63, s"at most 63 bits per signature, got ${planes.length}")
  require(flipBits >= 1 && flipBits <= planes.length,
    s"flipBits must be in [1, ${planes.length}], got $flipBits")
  require(hamming >= 0 && hamming <= 2,
    s"hamming must be in [0, 2], got $hamming")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val flatPlanes: Array[Double] = planes.flatten
  private def bits: Int = planes.length
  private def dim: Int = planes.head.length
  private def t: Int = flipBits
  private def nProbes: Int =
    1 + (if (hamming >= 1) t else 0) + (if (hamming >= 2) t * (t - 1) / 2 else 0)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var sig = 0L
    // t-slot selection, ascending by (|dot|, plane index)
    val selIdx = new Array[Int](t)
    val selAbs = new Array[Double](t)
    var selN = 0
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
      val a = math.abs(dot)
      if (selN < t || a < selAbs(selN - 1)) {
        var pos = if (selN < t) selN else selN - 1
        while (pos > 0 && selAbs(pos - 1) > a) {
          selAbs(pos) = selAbs(pos - 1); selIdx(pos) = selIdx(pos - 1)
          pos -= 1
        }
        selAbs(pos) = a; selIdx(pos) = p
        if (selN < t) selN += 1
      }
      p += 1
    }
    val chosen = java.util.Arrays.copyOf(selIdx, selN)
    java.util.Arrays.sort(chosen)
    val out = new Array[Long](
      1 + (if (hamming >= 1) selN else 0)
        + (if (hamming >= 2) selN * (selN - 1) / 2 else 0))
    out(0) = sig
    var w = 1
    if (hamming >= 1) {
      var i = 0
      while (i < selN) { out(w) = sig ^ (1L << chosen(i)); w += 1; i += 1 }
    }
    if (hamming >= 2) {
      var i = 0
      while (i < selN) {
        var j = i + 1
        while (j < selN) {
          out(w) = sig ^ (1L << chosen(i)) ^ (1L << chosen(j))
          w += 1; j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("graftPlanes", flatPlanes, "double[]")
      val sig = ctx.freshName("sig")
      val dot = ctx.freshName("dot")
      val abs = ctx.freshName("absd")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val ok = ctx.freshName("ok")
      val selIdx = ctx.freshName("selIdx")
      val selAbs = ctx.freshName("selAbs")
      val selN = ctx.freshName("selN")
      val pos = ctx.freshName("pos")
      val out = ctx.freshName("out")
      val w = ctx.freshName("w")
      s"""
         |boolean $ok = $v.numElements() == $dim;
         |long $sig = 0L;
         |int[] $selIdx = new int[$t];
         |double[] $selAbs = new double[$t];
         |int $selN = 0;
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
         |    double $abs = Math.abs($dot);
         |    if ($selN < $t || $abs < $selAbs[$selN - 1]) {
         |      int $pos = ($selN < $t) ? $selN : $selN - 1;
         |      while ($pos > 0 && $selAbs[$pos - 1] > $abs) {
         |        $selAbs[$pos] = $selAbs[$pos - 1];
         |        $selIdx[$pos] = $selIdx[$pos - 1];
         |        $pos--;
         |      }
         |      $selAbs[$pos] = $abs;
         |      $selIdx[$pos] = $p;
         |      if ($selN < $t) $selN++;
         |    }
         |  }
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] chosen$selIdx = java.util.Arrays.copyOf($selIdx, $selN);
         |  java.util.Arrays.sort(chosen$selIdx);
         |  long[] $out = new long[1
         |    + (${hamming} >= 1 ? $selN : 0)
         |    + (${hamming} >= 2 ? $selN * ($selN - 1) / 2 : 0)];
         |  $out[0] = $sig;
         |  int $w = 1;
         |  if (${hamming} >= 1) {
         |    for (int $i = 0; $i < $selN; $i++) {
         |      $out[$w++] = $sig ^ (1L << chosen$selIdx[$i]);
         |    }
         |  }
         |  if (${hamming} >= 2) {
         |    for (int $i = 0; $i < $selN; $i++) {
         |      for (int $j = $i + 1; $j < $selN; $j++) {
         |        $out[$w++] = $sig ^ (1L << chosen$selIdx[$i])
         |          ^ (1L << chosen$selIdx[$j]);
         |      }
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : HyperplaneProbesExpr = copy(child = newChild)

  override def prettyName: String = "graft_hyperplane_probes"
}
