package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Schema-driven staging projection — reference P-1..P-4.
  *
  * The reference generates a `CREATE TEMPORARY VIEW ... AS SELECT` whose
  * select-list is built by walking the input schema: columns matching a
  * drop-prefix are removed, the label column is kept verbatim, and
  * integer columns are `CAST(... AS DOUBLE)` (reference
  * `Trainer.scala:100-107`). Here the same policy is a pure
  * `StructType => Seq[Column]` function, so Catalyst sees a plain
  * projection (column pruning + pushdown apply as usual).
  *
  * Widening policy (deviation documented per SURVEY §7.4 item 5): like
  * the reference, `widenIntegers` covers Int (plus Short/Byte, which the
  * reference never sees). `LongType` is NOT widened unless `widenLongs`
  * is explicitly set — longs above 2^53 lose precision as doubles, so
  * silently widening bigint key columns could corrupt joins.
  */
object Staging {

  final case class StagingSpec(
      dropPrefixes: Seq[String] = Nil,
      labelColumn: Option[String] = None,
      widenIntegers: Boolean = true,
      widenLongs: Boolean = false)

  /** P-1/P-4: build the staged select-list from a schema. */
  def stagingColumns(schema: StructType, spec: StagingSpec): Seq[Column] =
    schema.fields.toSeq.flatMap { f =>
      if (spec.dropPrefixes.exists(f.name.startsWith)) None
      else if (spec.labelColumn.contains(f.name)) Some(col(f.name))
      else
        f.dataType match {
          case IntegerType | ShortType | ByteType if spec.widenIntegers =>
            Some(col(f.name).cast(DoubleType).as(f.name))
          case LongType if spec.widenLongs =>
            Some(col(f.name).cast(DoubleType).as(f.name))
          case _ => Some(col(f.name))
        }
    }

  /** Apply the staged projection (the reference materializes this as a
    * temp view, `Trainer.scala:112-116`; ours stays a lazy plan).
    */
  def stage(df: DataFrame, spec: StagingSpec): DataFrame =
    df.select(stagingColumns(df.schema, spec): _*)

  /** S-3 parity: register the staged projection as a named view. */
  def stageAsView(df: DataFrame, spec: StagingSpec, viewName: String): DataFrame = {
    val staged = stage(df, spec)
    staged.createOrReplaceTempView(viewName)
    staged
  }
}
