package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Two-level EXACT nearest-centroid search: the IVF assignment trick
  * (a coarse centroid-of-centroids probe) applied to the assignment
  * expression itself, with a triangle-inequality bound that keeps the
  * answer bit-identical to the exhaustive argmax.
  *
  * Why: [[NearestCentroidExpr]] is a k×dim loop per row — O(cells)
  * per assigned vector. Fine while an index has tens of cells, but an
  * incremental append against a 10⁵-cell index pays
  * O(delta·cells·dim), the one measured super-linear verb in the
  * index lifecycle (BASELINE.md round-10 probe: 1.40→2.41 s at ×10 as
  * cells grew 7→78). Grouping the k centroids under G ≈ √k coarse
  * centers turns the common case into O(G·dim + occupancy·dim) per
  * row — while EXACTNESS survives via the spherical triangle
  * inequality: for unit centroid m in group g with unit center u and
  * max member angle r_g,
  *
  *   ∠(x,m) ≥ ∠(x,u) − r_g   ⇒   dot(x,m) ≤ |x|·cos(max(0, ∠(x,u)−r_g))
  *
  * so a whole group is skipped only when this upper bound (plus an
  * epsilon covering acos/cos rounding) is STRICTLY below the best
  * exact dot already found — ties therefore always get scanned and
  * still resolve to the lowest cell id. Member dots use the same
  * normalized flat matrix and the same j-loop accumulation order as
  * the exhaustive expression, so the chosen cell matches bit-for-bit
  * (pinned by CoarseCentroidSpec's equivalence property over random,
  * tied, and dirty rows).
  *
  * Group construction is deterministic (evenly-spaced seeds, one
  * mean-refine pass) and cheap relative to the scan it accelerates —
  * O(k·G·dim) once per plan, driver-side; the coarse structure rides
  * to executors as one codegen reference object. Group QUALITY only
  * affects pruning efficiency, never correctness.
  *
  * Semantics (identical to [[NearestCentroidExpr]]): null → null;
  * dirty row (length ≠ dim, null element, zero norm) → cell 0;
  * zero-norm centroids never win; ties → lowest cell id.
  */
final case class NearestCentroidCoarseExpr(child: Expression,
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

  @transient private lazy val index = new CoarseCentroidIndex(centroids)

  override def nullSafeEval(input: Any): Any =
    index.nearest(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("graftCoarseIndex", index,
        classOf[CoarseCentroidIndex].getName)
      s"${ev.value} = $ref.nearest($v);"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : NearestCentroidCoarseExpr = copy(child = newChild)

  override def prettyName: String = "graft_nearest_centroid_coarse"
}

/** The coarse two-level structure behind [[NearestCentroidCoarseExpr]].
  * Serializable so codegen can carry it as a reference object.
  */
final class CoarseCentroidIndex(cents: Array[Array[Double]])
    extends Serializable {
  private val k = cents.length
  private val dim = cents.head.length

  /** Unit-normalized flat matrix + dead flags — the SAME layout and
    * normalization as [[NearestCentroidExpr]], so member dots are
    * bit-identical.
    */
  private val flatNorm = new Array[Double](k * dim)
  private val dead = new Array[Boolean](k)
  locally {
    var c = 0
    while (c < k) {
      val row = cents(c)
      var n2 = 0.0
      var i = 0
      while (i < dim) { n2 += row(i) * row(i); i += 1 }
      val n = math.sqrt(n2)
      if (n == 0.0) dead(c) = true
      else {
        i = 0
        while (i < dim) { flatNorm(c * dim + i) = row(i) / n; i += 1 }
      }
      c += 1
    }
  }

  // ----- coarse grouping: evenly-spaced seeds over the ALIVE
  // centroids, one assign pass, one mean-refine pass, final radii.
  private val alive: Array[Int] = (0 until k).filterNot(dead).toArray
  private val gCount = math.max(1,
    math.min(alive.length, math.ceil(math.sqrt(k.toDouble)).toInt))
  private val gUnit = new Array[Double](gCount * dim)
  private val members = new Array[Array[Int]](gCount)
  // max angle center→member, padded for acos rounding: the bound must
  // only ever be LOOSE, never tight by a ulp
  private val gRad = new Array[Double](gCount)
  locally {
    if (alive.isEmpty) {
      // all centroids zero-norm: no groups to build — nearest() exits
      // on its alive.isEmpty check before touching members, but keep
      // the structure total anyway
      var g = 0
      while (g < gCount) { members(g) = Array.emptyIntArray; g += 1 }
    } else buildGroups()
  }

  private def buildGroups(): Unit = {
    // seeds: every (alive/G)-th alive centroid
    var g = 0
    while (g < gCount) {
      val seed = alive((g.toLong * alive.length / gCount).toInt)
      System.arraycopy(flatNorm, seed * dim, gUnit, g * dim, dim)
      g += 1
    }
    def assignAll(): Array[Int] = alive.map { c =>
      var best = 0; var bestDot = Double.NegativeInfinity
      var gg = 0
      while (gg < gCount) {
        var dot = 0.0; var j = 0
        while (j < dim) { dot += gUnit(gg * dim + j) * flatNorm(c * dim + j); j += 1 }
        if (dot > bestDot) { bestDot = dot; best = gg }
        gg += 1
      }
      best
    }
    // one refine: mean of assigned members, re-unit-normalized
    val first = assignAll()
    g = 0
    while (g < gCount) {
      val mine = alive.indices.filter(first(_) == g)
      if (mine.nonEmpty) {
        val mean = new Array[Double](dim)
        mine.foreach { ai =>
          val off = alive(ai) * dim
          var j = 0
          while (j < dim) { mean(j) += flatNorm(off + j); j += 1 }
        }
        var n2 = 0.0
        var j = 0
        while (j < dim) { n2 += mean(j) * mean(j); j += 1 }
        val n = math.sqrt(n2)
        if (n > 0) {
          j = 0
          while (j < dim) { gUnit(g * dim + j) = mean(j) / n; j += 1 }
        } // zero mean → keep the seed center
      }
      g += 1
    }
    val second = assignAll()
    g = 0
    while (g < gCount) {
      val mine = alive.indices.filter(second(_) == g).map(alive(_)).toArray
      members(g) = mine
      var r = 0.0
      mine.foreach { c =>
        var dot = 0.0; var j = 0
        while (j < dim) { dot += gUnit(g * dim + j) * flatNorm(c * dim + j); j += 1 }
        val ang = math.acos(math.max(-1.0, math.min(1.0, dot)))
        if (ang > r) r = ang
      }
      gRad(g) = r + 1e-9
      g += 1
    }
  }

  /** Exact nearest cell (see class doc for semantics). */
  def nearest(v: ArrayData): Int = {
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
    if (alive.isEmpty) return 0
    val xn = math.sqrt(norm2)

    // upper bound per group from the spherical triangle inequality
    val ub = new Array[Double](gCount)
    val order = new Array[Integer](gCount)
    var g = 0
    while (g < gCount) {
      var dot = 0.0
      var j = 0
      while (j < dim) { dot += gUnit(g * dim + j) * v.getDouble(j); j += 1 }
      val ang = math.acos(math.max(-1.0, math.min(1.0, dot / xn)))
      val rel = ang - gRad(g)
      ub(g) = if (rel <= 0) xn else xn * math.cos(rel)
      order(g) = g
      g += 1
    }
    java.util.Arrays.sort(order,
      (a: Integer, b: Integer) => java.lang.Double.compare(ub(b), ub(a)))

    val eps = 1e-9 * xn // covers acos/cos rounding in the bound
    var best = -1
    var bestDot = Double.NegativeInfinity
    var oi = 0
    while (oi < gCount) {
      val gg = order(oi).intValue()
      if (ub(gg) + eps < bestDot) return if (best < 0) 0 else best
      val mine = members(gg)
      var mi = 0
      while (mi < mine.length) {
        val c = mine(mi)
        var dot = 0.0
        var j = 0
        val off = c * dim
        while (j < dim) { dot += flatNorm(off + j) * v.getDouble(j); j += 1 }
        if (dot > bestDot || (dot == bestDot && c < best)) {
          bestDot = dot; best = c
        }
        mi += 1
      }
      oi += 1
    }
    if (best < 0) 0 else best
  }
}
