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

  /** S-3, SQL-DDL path: generate the `CREATE OR REPLACE TEMPORARY VIEW
    * … AS SELECT …` text the reference emits into its REPL (reference
    * `Trainer.scala:100-116`) and execute it. Same select-list policy as
    * [[stagingColumns]], rendered as SQL.
    */
  def stagingSql(schema: StructType, spec: StagingSpec,
      sourceTable: String, viewName: String): String = {
    val items = schema.fields.toSeq.flatMap { f =>
      val q = s"`${f.name}`"
      if (spec.dropPrefixes.exists(f.name.startsWith)) None
      else if (spec.labelColumn.contains(f.name)) Some(q)
      else f.dataType match {
        case IntegerType | ShortType | ByteType if spec.widenIntegers =>
          Some(s"CAST($q AS DOUBLE) AS $q")
        case LongType if spec.widenLongs =>
          Some(s"CAST($q AS DOUBLE) AS $q")
        case _ => Some(q)
      }
    }
    s"CREATE OR REPLACE TEMPORARY VIEW `$viewName` AS SELECT ${items.mkString(", ")} FROM `$sourceTable`"
  }

  def stageViaSqlDdl(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
      spec: StagingSpec, sourceView: String, viewName: String): DataFrame = {
    df.createOrReplaceTempView(sourceView)
    spark.sql(stagingSql(df.schema, spec, sourceView, viewName))
    spark.table(viewName)
  }
}
