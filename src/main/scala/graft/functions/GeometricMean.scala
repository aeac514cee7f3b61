package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregate (the `Aggregator[IN, BUF, OUT]` surface —
  * §2.2 UDAF row): geometric mean via log-sum, numerically stable for
  * products that would overflow. Partial/final combine comes from the
  * Aggregator contract, so Catalyst plans it like any builtin
  * (map-side partial merge before the shuffle).
  *
  * Null/non-positive inputs are ignored (geometric mean is defined on
  * positive reals); all-invalid groups yield null.
  */
object GeometricMean extends Aggregator[java.lang.Double, (Double, Long), java.lang.Double] {

  override def zero: (Double, Long) = (0.0, 0L)

  override def reduce(b: (Double, Long), x: java.lang.Double): (Double, Long) =
    if (x == null || x <= 0.0) b else (b._1 + math.log(x), b._2 + 1)

  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Double, Long)): java.lang.Double =
    if (r._2 == 0L) null else Double.box(math.exp(r._1 / r._2))

  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)

  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE

  /** Column form: `geomMean(col("x"))`. */
  val asUdaf = udaf(GeometricMean)

  def apply(c: Column): Column = asUdaf(c)
}
