package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k by NUMERIC score: keep the k largest
  * (score, id) pairs, score descending, ties broken by ascending id.
  * The numeric twin of [[TopKMinByKey]] (which ranks md5-string
  * tickets): the buffer never exceeds k entries, so each task's
  * map-side partial is O(k) regardless of group size — a per-group
  * `row_number` window would instead sort-shuffle EVERY candidate row
  * of a group into one task before discarding all but k. This is the
  * aggregation shape that makes a batch k-NN join one pass
  * ([[graft.llm.Similarity.knnJoinBrute]]).
  *
  * The (−score, id) order is total for distinct ids, so results are
  * deterministic under any merge order. NaN scores are ignored (they
  * can't rank). SQL NULL scores are NOT representable by the primitive
  * input encoder — callers must filter them out first
  * (`score.isNotNull`, as [[graft.llm.Similarity.knnJoinBrute]] does);
  * an unfiltered null would otherwise decode as 0.0 and could occupy a
  * top-k slot.
  */
class TopKMaxByScore(k: Int)
    extends Aggregator[(Double, Long), TopKMaxByScore.Buf, Seq[TopKMaxByScore.Entry]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: TopKMaxByScore.Buf = TopKMaxByScore.Buf(Vector.empty)

  // "a ranks before b": higher score first, then lower id
  private def before(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def reduce(b: TopKMaxByScore.Buf,
      x: (Double, Long)): TopKMaxByScore.Buf =
    if (x._1.isNaN) b
    else if (b.items.length >= k &&
      !before((x._1, x._2), (b.items.last.score, b.items.last.id))) b
    else {
      val e = TopKMaxByScore.Entry(x._1, x._2)
      val i = b.items.indexWhere(it => before((e.score, e.id), (it.score, it.id)))
      val ins = if (i < 0) b.items :+ e else b.items.patch(i, Seq(e), 0)
      TopKMaxByScore.Buf(ins.take(k))
    }

  override def merge(a: TopKMaxByScore.Buf,
      b: TopKMaxByScore.Buf): TopKMaxByScore.Buf =
    b.items.foldLeft(a)((acc, e) => reduce(acc, (e.score, e.id)))

  override def finish(r: TopKMaxByScore.Buf): Seq[TopKMaxByScore.Entry] =
    r.items

  override def bufferEncoder: Encoder[TopKMaxByScore.Buf] =
    Encoders.product[TopKMaxByScore.Buf]

  override def outputEncoder: Encoder[Seq[TopKMaxByScore.Entry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKMaxByScore {
  case class Entry(score: Double, id: Long)
  case class Buf(items: Vector[Entry])

  /** Column form: `TopKMaxByScore(5)(col("score"), col("id"))` → array
    * of the k largest (score, id) structs, descending score.
    */
  def apply(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKMaxByScore(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))(score, id)
}
