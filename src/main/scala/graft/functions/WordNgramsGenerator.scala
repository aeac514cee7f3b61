package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native table-generating expression: one (pos, ngram) output row per
  * word n-gram of a token array — the streaming form of
  * `explode(transform(sequence(...), i -> array_join(slice(...))))`.
  *
  * Why a Generator and not the composable form: the composable chain
  * materializes the FULL n-gram array per input row before the
  * Generate node consumes it (sequence → transform → array_join each
  * allocate), so peak memory per row is O(doc length) strings twice
  * over. This generator emits rows lazily from the token array —
  * nothing larger than one n-gram string is ever allocated — which is
  * the difference between scanning 100 TB of long documents in bounded
  * memory and sizing executors for the longest document. Rows with
  * fewer than `n` tokens degrade to ONE whole-text n-gram, matching
  * the `Dedup.shingles` convention (reference semantics:
  * mindseye-dataframes has no text operators; this follows the
  * established graft shingling contract).
  *
  * Registered in SQL as `graft_ngrams(array<string>, n)` for
  * `LATERAL VIEW` / generator-position use ([[GraftExtensions]]).
  */
case class WordNgramsGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams requires array<string>, got ${other.simpleString(10)}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val value = child.eval(input)
    if (value == null) Iterator.empty
    else {
      val data = value.asInstanceOf[ArrayData]
      val len = data.numElements()
      if (len == 0) Iterator.empty
      else if (len < n) {
        val parts = Array.tabulate(len)(i => data.getUTF8String(i))
        Iterator.single(InternalRow(0, UTF8String.concatWs(space, parts: _*)))
      } else {
        (0 to len - n).iterator.map { i =>
          val parts = Array.tabulate(n)(j => data.getUTF8String(i + j))
          InternalRow(i, UTF8String.concatWs(space, parts: _*))
        }
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordNgramsGenerator = copy(child = newChild)

  override def prettyName: String = "graft_ngrams"
}
