package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k: keep the k smallest (sortKey, id) pairs,
  * ordered lexicographically. The buffer NEVER exceeds k entries, so
  * the map-side partial each task ships is O(k) regardless of group
  * size — the scale-right alternative to a `row_number` window, which
  * must sort-shuffle EVERY group row into one task before discarding
  * all but k. Catalyst plans the Aggregator contract like any builtin
  * (partial merge before the exchange).
  *
  * Ordering is total ((sortKey, id) with distinct ids), so results are
  * deterministic for any merge order. Null sort keys are ignored (a
  * null can't rank). Used by
  * [[graft.relational.Sampling.weightedSample]]; general enough for
  * any "n smallest per group" (invert the key for n largest).
  */
class TopKMinByKey(k: Int)
    extends Aggregator[(String, Long), TopKMinByKey.Buf, Seq[TopKMinByKey.Entry]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: TopKMinByKey.Buf = TopKMinByKey.Buf(Vector.empty)

  private def lt(a: (String, Long), b: (String, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def reduce(b: TopKMinByKey.Buf,
      x: (String, Long)): TopKMinByKey.Buf =
    if (x._1 == null) b
    else if (b.items.length >= k &&
      !lt((x._1, x._2), (b.items.last.sortKey, b.items.last.id))) b
    else {
      val e = TopKMinByKey.Entry(x._1, x._2)
      val i = b.items.indexWhere(it => lt((e.sortKey, e.id), (it.sortKey, it.id)))
      val ins = if (i < 0) b.items :+ e else b.items.patch(i, Seq(e), 0)
      TopKMinByKey.Buf(ins.take(k))
    }

  override def merge(a: TopKMinByKey.Buf,
      b: TopKMinByKey.Buf): TopKMinByKey.Buf =
    b.items.foldLeft(a)((acc, e) => reduce(acc, (e.sortKey, e.id)))

  override def finish(r: TopKMinByKey.Buf): Seq[TopKMinByKey.Entry] = r.items

  override def bufferEncoder: Encoder[TopKMinByKey.Buf] =
    Encoders.product[TopKMinByKey.Buf]

  override def outputEncoder: Encoder[Seq[TopKMinByKey.Entry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKMinByKey {
  case class Entry(sortKey: String, id: Long)
  case class Buf(items: Vector[Entry])

  /** Column form: `TopKMinByKey(5)(col("ticket"), col("id"))` → array
    * of the k smallest (sortKey, id) structs, ascending.
    */
  def apply(k: Int)(sortKey: Column, id: Column): Column =
    udaf(new TopKMinByKey(k),
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong))(sortKey, id)
}
