package graft.encode

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Recursive schema walk → flat feature paths.
  *
  * Replaces the reference's per-row recursive descent (reference
  * `DataframeModeler.scala:68-119`: `getRepresentationKeys` /
  * `getTransformKeys` / `convertToResults` each re-walk `Row.get(i)`)
  * with a one-time walk of the `StructType` producing, per leaf, a
  * Catalyst `Column` — so the actual per-row work happens inside
  * whole-stage codegen, not interpreted Scala.
  *
  * Type dispatch matches the reference exactly (reference
  * `DataframeModeler.scala:70-98`): Int/String → categorical,
  * Double → numeric, Struct → recurse with `/`-joined path, anything
  * else contributes nothing. Float/Long are additionally accepted as
  * numeric (documented deviation — the reference crashes on them with a
  * `MatchError`; the fixtures contain both).
  */
object SchemaPaths {

  sealed trait Kind
  case object Categorical extends Kind
  case object Numeric extends Kind

  /** A flattened leaf: reference-style `/`-joined path plus the Catalyst
    * column expression that reads it (nested fields use field access on
    * the parent column, robust to dots in names).
    */
  final case class FeaturePath(path: String, column: Column, kind: Kind)

  def flatten(schema: StructType): Seq[FeaturePath] = {
    def walk(fields: Seq[StructField], parentPath: String,
        parentCol: Option[Column]): Seq[FeaturePath] =
      fields.flatMap { f =>
        val path = if (parentPath.isEmpty) f.name else s"$parentPath/${f.name}"
        // backtick-quote root names so a literal dot in a column name is
        // not parsed as struct-field access
        val c = parentCol.map(_.getField(f.name))
          .getOrElse(col(s"`${f.name}`"))
        f.dataType match {
          case s: StructType => walk(s.fields.toSeq, path, Some(c))
          case IntegerType | StringType =>
            Seq(FeaturePath(path, c, Categorical))
          case DoubleType | FloatType | LongType =>
            Seq(FeaturePath(path, c, Numeric))
          case _ => Nil
        }
      }
    walk(schema.fields.toSeq, "", None)
  }

  def categorical(schema: StructType): Seq[FeaturePath] =
    flatten(schema).filter(_.kind == Categorical)

  def numeric(schema: StructType): Seq[FeaturePath] =
    flatten(schema).filter(_.kind == Numeric)
}
