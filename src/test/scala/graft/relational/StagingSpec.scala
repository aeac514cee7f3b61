package graft.relational

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.relational.Staging.{StagingSpec => StagingConf}

class StagingSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1, 2L, 3.5, "a", "drop_me")
  ).toDF("i", "l", "d", "s", "drop_col")

  test("widens Int to Double, leaves Double/String untouched") {
    val out = Staging.stage(df, StagingConf())
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("i") == DoubleType)
    assert(types("d") == DoubleType)
    assert(types("s") == StringType)
  }

  test("does NOT widen Long unless widenLongs is set") {
    val defaultOut = Staging.stage(df, StagingConf())
    assert(defaultOut.schema("l").dataType == LongType)
    val widened = Staging.stage(df, StagingConf(widenLongs = true))
    assert(widened.schema("l").dataType == DoubleType)
  }

  test("drops columns by prefix") {
    val out = Staging.stage(df, StagingConf(dropPrefixes = Seq("drop_")))
    assert(!out.columns.contains("drop_col"))
    assert(out.columns.toSeq == Seq("i", "l", "d", "s"))
  }

  test("label column is kept verbatim (no cast)") {
    val out = Staging.stage(df, StagingConf(labelColumn = Some("i")))
    assert(out.schema("i").dataType == IntegerType)
  }

  test("values survive the projection") {
    val out = Staging.stage(df, StagingConf(dropPrefixes = Seq("drop_")))
      .collect().head
    assert(out.getDouble(0) == 1.0)
    assert(out.getLong(1) == 2L)
    assert(out.getDouble(2) == 3.5)
    assert(out.getString(3) == "a")
  }

  test("widenIntegers=false keeps Int") {
    val out = Staging.stage(df, StagingConf(widenIntegers = false))
    assert(out.schema("i").dataType == IntegerType)
  }
}
