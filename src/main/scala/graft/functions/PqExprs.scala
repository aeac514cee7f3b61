package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** Native product-quantization encoder: an `array<double>` vector is
  * split into `m` contiguous subvectors and each is assigned to its
  * Euclidean-nearest codeword in that subspace's codebook — ONE fused
  * pass over the m×k×sub codebook tensor per row (total work k×dim,
  * identical to a single full-dimension assign).
  *
  * Assignment uses the dot-product identity
  * `argmin ‖v_j − c‖² = argmax (v_j·c − ‖c‖²/2)`, so the codebook is
  * embedded flat alongside precomputed half-squared-norms and the inner
  * loop is a pure multiply-add.
  *
  * Semantics:
  *   - null input → null
  *   - dirty row (length ≠ m·sub, null element) → null (PQ codes for a
  *     malformed vector are meaningless; callers filter or null-check)
  *   - ties resolve to the lowest codeword id (deterministic)
  */
final case class PqEncodeExpr(child: Expression,
    codebooks: Array[Array[Array[Double]]]) extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.head.nonEmpty,
    "codebooks must be non-empty (m subspaces × k codewords)")
  require(codebooks.forall(_.length == codebooks.head.length),
    "every subspace must have the same codeword count k")
  require(codebooks.forall(_.forall(_.length == codebooks.head.head.length)),
    "every codeword must have the same subvector length")

  private def m: Int = codebooks.length
  private def k: Int = codebooks.head.length
  private def sub: Int = codebooks.head.head.length
  private def dim: Int = m * sub

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  /** Flat m×k×sub codeword tensor + half squared norms (m×k). */
  @transient private lazy val (flat: Array[Double], halfNorm2: Array[Double]) = {
    val f = new Array[Double](m * k * sub)
    val h = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        val cw = codebooks(j)(c)
        var n2 = 0.0
        var i = 0
        while (i < sub) {
          f((j * k + c) * sub + i) = cw(i)
          n2 += cw(i) * cw(i)
          i += 1
        }
        h(j * k + c) = 0.5 * n2
        c += 1
      }
      j += 1
    }
    (f, h)
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return null; i += 1 }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < k) {
        var dot = 0.0
        val off = (j * k + c) * sub
        var i2 = 0
        while (i2 < sub) {
          dot += flat(off + i2) * v.getDouble(j * sub + i2)
          i2 += 1
        }
        val score = dot - halfNorm2(j * k + c)
        if (score > bestScore) { bestScore = score; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val flatRef = ctx.addReferenceObj("graftPqFlat", flat, "double[]")
      val hRef = ctx.addReferenceObj("graftPqHalfNorm", halfNorm2, "double[]")
      val codes = ctx.freshName("codes")
      val ok = ctx.freshName("ok")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val off = ctx.freshName("off")
      s"""
         |boolean $ok = $v.numElements() == $dim;
         |if ($ok) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($v.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    int $best = 0;
         |    double $bestScore = Double.NEGATIVE_INFINITY;
         |    for (int $c = 0; $c < $k; $c++) {
         |      double $dot = 0.0;
         |      int $off = ($j * $k + $c) * $sub;
         |      for (int $i = 0; $i < $sub; $i++) {
         |        $dot += $flatRef[$off + $i] * $v.getDouble($j * $sub + $i);
         |      }
         |      double $score = $dot - $hRef[$j * $k + $c];
         |      if ($score > $bestScore) { $bestScore = $score; $best = $c; }
         |    }
         |    $codes[$j] = $best;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : PqEncodeExpr = copy(child = newChild)

  override def prettyName: String = "graft_pq_encode"
}

/** Pack `array<int>` PQ codes (each in [0, 256)) into one byte per
  * code — the stored-index form. A 64-dim float32 embedding is 256 B;
  * its 8-byte PQ code is a 32× reduction, which is what makes a
  * 100 TB embedding corpus scorable from memory. Out-of-range or null
  * codes → null.
  */
final case class PqPackExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${dt.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val c = a.getInt(i)
      if (c < 0 || c > 255) return null
      out(i) = c.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val c = ctx.freshName("cv")
      val ok = ctx.freshName("ok")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |boolean $ok = true;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $ok = false; break; }
         |  int $c = $a.getInt($i);
         |  if ($c < 0 || $c > 255) { $ok = false; break; }
         |  $out[$i] = (byte) $c;
         |}
         |if ($ok) { ${ev.value} = $out; } else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : PqPackExpr = copy(child = newChild)

  override def prettyName: String = "graft_pq_pack"
}

/** Asymmetric-distance (ADC) score of byte-packed PQ codes against a
  * query lookup table: `Σ_j lut[j·k + code_j]` — the query-time hot
  * path, m table reads and adds per row, no vector access at all.
  * The LUT (m×k doubles, built driver-side from the query vector) is
  * embedded as a codegen reference.
  *
  * Codes of the wrong length → null (a code byte is unsigned, so any
  * byte is in range by construction when k = 256; for k < 256 the
  * encoder never emits ≥ k and stored garbage scores harmlessly).
  */
final case class PqAdcExpr(child: Expression, lut: Array[Double], k: Int)
    extends UnaryExpression {

  require(k > 0 && k <= 256, s"k must be in [1, 256], got $k")
  require(lut.nonEmpty && lut.length % k == 0,
    s"lut length ${lut.length} must be a positive multiple of k=$k")

  private def m: Int = lut.length / k

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary packed codes, got ${dt.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[Array[Byte]]
    if (codes.length != m) return null
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = codes(j) & 0xff
      if (c >= k) return null
      s += lut(j * k + c)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, codes => {
      val lutRef = ctx.addReferenceObj("graftPqLut", lut, "double[]")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val c = ctx.freshName("cv")
      val ok = ctx.freshName("ok")
      s"""
         |boolean $ok = $codes.length == $m;
         |double $s = 0.0;
         |if ($ok) {
         |  for (int $j = 0; $j < $m; $j++) {
         |    int $c = $codes[$j] & 0xff;
         |    if ($c >= $k) { $ok = false; break; }
         |    $s += $lutRef[$j * $k + $c];
         |  }
         |}
         |if ($ok) { ${ev.value} = $s; } else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : PqAdcExpr = copy(child = newChild)

  override def prettyName: String = "graft_pq_adc"
}
