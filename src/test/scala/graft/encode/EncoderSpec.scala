package graft.encode

import graft.SparkSpec
import graft.encode.Encoder._

class EncoderSpec extends SparkSpec {
  import spark.implicits._

  test("deterministic init: same key => same vector, RMS 1") {
    val a = Deterministic.representation("col=x", 10)
    val b = Deterministic.representation("col=x", 10)
    assert(a.toSeq == b.toSeq)
    val rms = math.sqrt(a.map(v => v * v).sum / a.length)
    assert(math.abs(rms - 1.0) < 1e-12)
    assert(Deterministic.representation("col=y", 10).toSeq != a.toSeq)
  }

  test("uuid identity is UUIDv3 of the key") {
    assert(Deterministic.uuidFor("a=1") ==
      java.util.UUID.nameUUIDFromBytes("a=1".getBytes("UTF-8")))
  }

  test("one-hot label representation, frozen shape") {
    val v = Deterministic.oneHot(3, 7)
    assert(v.toSeq == Seq(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0))
    intercept[IllegalArgumentException](Deterministic.oneHot(0, 7))
    intercept[IllegalArgumentException](Deterministic.oneHot(8, 7))
  }

  test("fit discovers categorical keys and numeric stats in two jobs") {
    val df = Seq(("a", 1, 2.0), ("b", 2, 4.0)).toDF("s", "i", "d")
    val state = Encoder.fit(df, EncoderSpec(featureDim = 4))
    assert(state.representations.keySet ==
      Set("s=a", "s=b", "i=1", "i=2"))
    val t = state.transforms("d")
    assert(t.mean == 3.0 && t.stdPop == 1.0)
  }

  test("evalToDataframe: sum mode yields featureDim array per row") {
    val df = Seq(("a", 1.0), ("b", 3.0)).toDF("s", "x")
    val state = Encoder.fit(df, EncoderSpec(featureDim = 4))
    val out = Encoder.evalToDataframe(spark, df, state, "features")
    assert(out.schema.fieldNames.toSeq == Seq("features"))
    val rows = out.collect().map(_.getSeq[Double](0))
    assert(rows.forall(_.length == 4))
    // manual expectation for row ("a", 1.0): emb("s=a") + W·[1, z], z=(1-2)/1
    val emb = Deterministic.representation("s=a", 4)
    val w = Deterministic.transformWeights("x", 4)
    val expected = (0 until 4).map(k => emb(k) + w(0)(k) + w(1)(k) * -1.0)
    rows.head.zip(expected).foreach { case (got, exp) =>
      assert(math.abs(got - exp) < 1e-12)
    }
  }

  test("evalToDataframe is byte-stable across two independent fits") {
    val df = Seq(("a", 1.0), ("b", 3.0), ("a", 5.0)).toDF("s", "x")
    val r1 = Encoder.evalToDataframe(spark, df, Encoder.fit(df), "f")
      .collect().map(_.getSeq[Double](0))
    val r2 = Encoder.evalToDataframe(spark, df, Encoder.fit(df), "f")
      .collect().map(_.getSeq[Double](0))
    assert(r1.map(_.toList).toList == r2.map(_.toList).toList)
  }

  test("unseen categorical key at eval time gets the deterministic init") {
    val train = Seq(("a", 1.0)).toDF("s", "x")
    val state = Encoder.fit(train)
    val eval = Seq(("zzz", 1.0)).toDF("s", "x") // "s=zzz" never fitted
    val out = Encoder.evalToDataframe(spark, eval, state, "f")
      .collect().head.getSeq[Double](0)
    val emb = Deterministic.representation("s=zzz", 10)
    val t = state.transforms("x")
    val z = (1.0 - t.mean) / t.safeStd
    val w = t.weights
    (0 until 10).foreach { k =>
      assert(math.abs(out(k) - (emb(k) + w(0)(k) + w(1)(k) * z)) < 1e-12)
    }
  }

  test("broadcast-udf lookup path (maxLiteralKeys=0) matches literal path") {
    val df = Seq(("a", 1.0), ("b", 2.0)).toDF("s", "x")
    val lit = Encoder.fit(df, EncoderSpec(featureDim = 3))
    val bc = Encoder.fit(df, EncoderSpec(featureDim = 3, maxLiteralKeys = 0))
    val rLit = Encoder.evalToDataframe(spark, df, lit, "f")
      .collect().map(_.getSeq[Double](0).toList).toList
    val rBc = Encoder.evalToDataframe(spark, df, bc, "f")
      .collect().map(_.getSeq[Double](0).toList).toList
    assert(rLit == rBc)
  }

  test("nested structs flatten with /-joined paths and encode") {
    val df = Seq((("a", 2.0), 1)).toDF("nest", "i")
    val leaves = SchemaPaths.flatten(df.schema)
    assert(leaves.map(_.path) == Seq("nest/_1", "nest/_2", "i"))
    val state = Encoder.fit(df)
    assert(state.representations.contains("nest/_1=a"))
    assert(state.transforms.contains("nest/_2"))
    val out = Encoder.evalToDataframe(spark, df, state, "f").collect()
    assert(out.head.getSeq[Double](0).length == 10)
  }

  test("label column one-hots and freezes to labelCategories width") {
    val df = Seq((3, "a"), (1, "a")).toDF("label", "s")
    val state = Encoder.fit(df.select("label"),
      EncoderSpec(labelColumn = Some("label"), labelCategories = 7))
    assert(state.representations("label=3").toSeq ==
      Deterministic.oneHot(3, 7).toSeq)
    val out = Encoder.evalToDataframe(spark, df.select("label"), state, "y")
      .collect().map(_.getSeq[Double](0))
    assert(out.forall(_.length == 7))
    assert(out.head(2) == 1.0)
  }

  test("concat mode widens to nLeaves*featureDim") {
    val df = Seq(("a", 1.0)).toDF("s", "x")
    val state = Encoder.fit(df,
      EncoderSpec(featureDim = 4, structMode = ConcatReduce))
    val out = Encoder.evalToDataframe(spark, df, state, "f").collect()
    assert(out.head.getSeq[Double](0).length == 8)
    assert(state.outputDim(2) == 8)
  }
}
