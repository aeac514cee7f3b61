package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions into the session's FunctionRegistry so they are callable
  * from SQL text as well as the Column API.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.cosineDescriptor)
    ext.injectFunction(GraftFunctions.jaccardSortedDescriptor)
    ext.injectFunction(GraftFunctions.ngramsDescriptor)
    ext.injectOptimizerRule(_ => graft.plans.JaccardPrefilterRule)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftFunctions {

  private[functions] val cosineDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "graft_cosine"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"graft_cosine takes 2 arguments, got ${children.length}")
      CosineSimilarityExpr(children.head, children.last)
    })

  private[functions] val jaccardSortedDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_jaccard_sorted"),
    new ExpressionInfo(classOf[JaccardSortedExpr].getName, "graft_jaccard_sorted"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"graft_jaccard_sorted takes 2 arguments, got ${children.length}")
      JaccardSortedExpr(children.head, children.last)
    })

  private[functions] val ngramsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_ngrams"),
    new ExpressionInfo(classOf[WordNgramsGenerator].getName, "graft_ngrams"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"graft_ngrams takes 2 arguments (tokens, n), got ${children.length}")
      val n = children(1) match {
        case lit if lit.foldable && lit.dataType ==
            org.apache.spark.sql.types.IntegerType =>
          lit.eval().asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"graft_ngrams n must be an integer literal, got $other")
      }
      WordNgramsGenerator(children.head, n)
    })

  /** Column form: word n-gram generator rows (pos, ngram). */
  def ngrams(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(WordNgramsGenerator(Bridge.expression(tokens), n))
  }

  /** Column form: Jaccard of two sorted distinct array<bigint> sets. */
  def jaccardSorted(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(JaccardSortedExpr(Bridge.expression(a), Bridge.expression(b)))
  }

  /** Column form: cosine between a row vector and its assigned
    * centroid (one dim-loop; matrix embedded as a codegen reference).
    */
  def centroidCosine(vec: Column, cell: Column,
      centroids: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(CentroidCosineExpr(
      Bridge.expression(vec), Bridge.expression(cell), centroids))
  }

  /** Column form: fused b-bit hyperplane LSH signature (one pass over
    * the vector for all planes; matrix embedded as a codegen reference).
    */
  def hyperplaneSignature(vec: Column, planes: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graft.Bridge
    val arrDouble = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    Bridge.column(HyperplaneSignatureExpr(
      org.apache.spark.sql.catalyst.expressions.Cast(
        Bridge.expression(vec), arrDouble), planes))
  }

  /** Column form: query-directed multiprobe signature set — the exact
    * signature plus flips of up to `hamming` of the `flipBits`
    * lowest-|margin| bits, one fused pass (see HyperplaneProbesExpr).
    */
  def hyperplaneProbes(vec: Column, planes: Array[Array[Double]],
      flipBits: Int, hamming: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    val arrDouble = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    Bridge.column(HyperplaneProbesExpr(
      org.apache.spark.sql.catalyst.expressions.Cast(
        Bridge.expression(vec), arrDouble), planes, flipBits, hamming))
  }

  /** Above this cell count, [[nearestCentroid]] routes through the
    * two-level [[NearestCentroidCoarseExpr]] (bit-identical answers,
    * O(√k + occupancy) per row instead of O(k) — the fix for the one
    * super-linear index verb, IVF(×PQ) append against a grown index).
    * Below it the exhaustive loop is already cheap and the coarse
    * structure is pure overhead. Equivalence across the threshold is
    * pinned by CoarseCentroidSpec.
    */
  val CoarseAssignThreshold = 64

  /** Column form: cosine-nearest centroid cell id in one fused pass
    * (normalized matrix embedded as a codegen reference — the
    * composable argmin form plans k separate cosine expressions).
    * Exhaustive k×dim loop for small k; triangle-inequality two-level
    * search above [[CoarseAssignThreshold]] cells, same answers
    * bit-for-bit.
    */
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graft.Bridge
    val arrDouble = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    val cast = org.apache.spark.sql.catalyst.expressions.Cast(
      Bridge.expression(vec), arrDouble)
    Bridge.column(
      if (centroids.length > CoarseAssignThreshold)
        NearestCentroidCoarseExpr(cast, centroids)
      else NearestCentroidExpr(cast, centroids))
  }

  /** Column form: PQ-encode a vector against an m×k×sub codebook
    * tensor in one fused pass (Euclidean-nearest codeword per
    * subspace).
    */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    import org.apache.spark.sql.graft.Bridge
    val arrDouble = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    Bridge.column(PqEncodeExpr(
      org.apache.spark.sql.catalyst.expressions.Cast(
        Bridge.expression(vec), arrDouble), codebooks))
  }

  /** Column form: pack array<int> PQ codes into one byte per code. */
  def pqPack(codes: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(PqPackExpr(Bridge.expression(codes)))
  }

  /** Column form: ADC score of byte-packed codes against a flat m×k
    * query lookup table.
    */
  def pqAdc(codes: Column, lut: Array[Double], k: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(PqAdcExpr(Bridge.expression(codes), lut, k))
  }

  /** Column-API form — usable without registering the extension. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    val arrDouble = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    Bridge.column(CosineSimilarityExpr(
      org.apache.spark.sql.catalyst.expressions.Cast(
        Bridge.expression(a), arrDouble),
      org.apache.spark.sql.catalyst.expressions.Cast(
        Bridge.expression(b), arrDouble)))
  }
}
