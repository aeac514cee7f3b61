package graft.pipeline

import graft.SparkSpec
import graft.encode.Encoder.EncoderSpec
import graft.relational.Staging.StagingSpec
import graft.train.DistributedTrainer.TrainConfig

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("end-to-end: load -> stage -> split -> train -> report") {
    val rows = (1 to 400).map { i =>
      if (i % 2 == 0) ("alpha", 2.0 + (i % 7) * 0.1, i, 1)
      else ("beta", -2.0 - (i % 7) * 0.1, i, 2)
    }
    val raw = rows.toDF("cat", "x", "noise_int", "label")
    val result = Pipeline.run(spark, raw, Pipeline.PipelineConfig(
      staging = StagingSpec(dropPrefixes = Seq("noise_"),
        labelColumn = Some("label")),
      encoder = EncoderSpec(featureDim = 6),
      train = TrainConfig(hidden = Seq(8), classes = 2, labelCol = "label",
        iterations = 8, initialStep = 1.0, schedule = Seq(0.5, 1.0))))
    // staging dropped the noise column, kept the label un-widened
    assert(!result.staged.columns.contains("noise_int"))
    assert(result.staged.schema("label").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // loss decreased over the schedule
    val h = result.trainResult.lossHistory
    assert(h.last < h.head, s"no learning: $h")
    // separable data: held-out accuracy should be high
    assert(result.reportAccuracy >= 0.9,
      s"report accuracy ${result.reportAccuracy} too low")
    assert(result.report.columns.toSeq == Seq("label", "features", "prediction"))
  }

  test("pipeline unpersists the raw input even on failure") {
    val raw = Seq(("a", 1.0, 1)).toDF("cat", "x", "label")
    intercept[Exception] {
      Pipeline.run(spark, raw, Pipeline.PipelineConfig(
        train = TrainConfig(hidden = Nil, classes = 2,
          labelCol = "missing_label")))
    }
    assert(raw.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }
}
