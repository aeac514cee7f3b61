package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

import graft.encode.Encoder.EncoderSpec
import graft.relational.Staging
import graft.relational.Staging.StagingSpec
import graft.train.DistributedTrainer
import graft.train.DistributedTrainer.{TrainConfig, TrainResult}

/** EP-1: the reference's end-to-end notebook program as one composable
  * function — load → persist → stage → train/test split → schedule-
  * trained classifier → prediction report (reference
  * `Trainer.scala:85-200`).
  *
  * Differences from the reference, all documented in the modules they
  * live in: staging stays a lazy projection instead of a REPL-created
  * temp view; sampling/splitting is seeded; training state is immutable
  * snapshots; the prediction report is a single select, not a
  * positional three-frame zip.
  */
object Pipeline {

  final case class PipelineConfig(
      staging: StagingSpec = StagingSpec(),
      encoder: EncoderSpec = EncoderSpec(),
      train: TrainConfig,
      trainFraction: Double = 0.9,
      reportRows: Int = 100,
      seed: Long = 42L)

  final case class PipelineResult(
      staged: DataFrame,
      trainResult: TrainResult,
      report: DataFrame,
      /** Accuracy over the (up to `reportRows`-row) prediction report —
        * NOT the full test split; a quality smoke signal, not a model
        * evaluation metric.
        */
      reportAccuracy: Double)

  def run(spark: SparkSession, raw: DataFrame, cfg: PipelineConfig): PipelineResult = {
    // load side: raw input persisted at the reference's tier (C-1)
    raw.persist(StorageLevel.DISK_ONLY)
    try {
      // the label column must survive staging un-widened (training and
      // the report read it as int): force it into the staging spec
      val stagingSpec = cfg.staging.labelColumn match {
        case Some(_) => cfg.staging
        case None => cfg.staging.copy(labelColumn = Some(cfg.train.labelCol))
      }
      val staged = Staging.stage(raw, stagingSpec)
      val Array(trainDf, testDf) = staged.randomSplit(
        Array(cfg.trainFraction, 1.0 - cfg.trainFraction), cfg.seed)
      val result = DistributedTrainer.fit(spark, trainDf, cfg.encoder, cfg.train)
      val report = DistributedTrainer.predictionReport(
        spark, testDf, result.state, result.net, cfg.train.labelCol,
        cfg.reportRows)
      val rows = report.collect()
      val correct = rows.count { r =>
        // type-agnostic: the label may arrive as any numeric type
        val label = r.get(0).asInstanceOf[Number].intValue()
        val pred = r.getSeq[Double](2)
        pred.indexOf(pred.max) == label - 1
      }
      val acc = if (rows.isEmpty) 0.0 else correct.toDouble / rows.length
      PipelineResult(staged, result, report, acc)
    } finally raw.unpersist()
  }
}
