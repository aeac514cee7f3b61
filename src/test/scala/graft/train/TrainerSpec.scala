package graft.train

import graft.SparkSpec
import graft.encode.Encoder.EncoderSpec

class TrainerSpec extends SparkSpec {
  import spark.implicits._

  test("network forward/backward: finite-difference gradient check") {
    val net = Network.classifier(4, Seq(5), 3, seedPrefix = "gradcheck")
    val x = Array(0.3, -0.7, 1.2, 0.05)
    val (loss, grads, dx) = net.gradients(x, 1)
    val eps = 1e-6
    // check a weight gradient in each layer
    for (li <- net.layers.indices) {
      val bumped = Network(net.layers.updated(li, {
        val l = net.layers(li)
        l.copy(w = l.w.updated(0, l.w(0).updated(0, l.w(0)(0) + eps)))
      }))
      val lossUp = bumped.gradients(x, 1)._1
      val numeric = (lossUp - loss) / eps
      assert(math.abs(numeric - grads(li)._1(0)(0)) < 1e-4,
        s"layer $li dW mismatch: numeric $numeric vs analytic ${grads(li)._1(0)(0)}")
    }
    // input gradient too (it drives embedding updates)
    val xb = x.clone(); xb(2) += eps
    val lossUp = net.gradients(xb, 1)._1
    assert(math.abs((lossUp - loss) / eps - dx(2)) < 1e-4)
  }

  test("softmax probabilities sum to 1 and favor the right logit") {
    val net = Network.classifier(2, Nil, 3)
    val p = net.softmax(Array(0.0, 5.0, -2.0))
    assert(math.abs(p.sum - 1.0) < 1e-12)
    assert(p(1) > 0.9)
  }

  test("distributed fit: loss decreases monotonically on separable data") {
    // two clearly separable classes keyed by the categorical column
    val rows = (1 to 200).map { i =>
      if (i % 2 == 0) ("alpha", 2.0 + (i % 5) * 0.1, 1)
      else ("beta", -2.0 - (i % 5) * 0.1, 2)
    }
    val df = rows.toDF("cat", "x", "label")
    val result = DistributedTrainer.fit(spark, df,
      EncoderSpec(featureDim = 6),
      DistributedTrainer.TrainConfig(
        hidden = Seq(8), classes = 2, labelCol = "label",
        iterations = 6, initialStep = 1.0))
    val h = result.lossHistory
    assert(h.length >= 3, s"too few iterations recorded: $h")
    assert(h.last < h.head * 0.7,
      s"loss did not decrease enough: ${h.head} -> ${h.last}")
    // accepted steps must never increase loss
    h.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-9, s"loss rose: $h") }
  }

  test("prediction report classifies separable data correctly") {
    val rows = (1 to 200).map { i =>
      if (i % 2 == 0) ("alpha", 2.0, 1) else ("beta", -2.0, 2)
    }
    val df = rows.toDF("cat", "x", "label")
    val result = DistributedTrainer.fit(spark, df,
      EncoderSpec(featureDim = 6),
      DistributedTrainer.TrainConfig(
        hidden = Seq(8), classes = 2, labelCol = "label",
        iterations = 10, initialStep = 1.0))
    val report = DistributedTrainer.predictionReport(
      spark, df, result.state, result.net, "label", limit = 50)
    assert(report.columns.toSeq == Seq("label", "features", "prediction"))
    val rows2 = report.collect()
    val correct = rows2.count { r =>
      val label = r.getInt(0)
      val pred = r.getSeq[Double](2)
      pred.indexOf(pred.max) == label - 1
    }
    assert(correct >= 45, s"only $correct/50 correct on separable data")
  }

  test("non-default mappingPower trains consistently (encoder == trainer)") {
    // quadratic term in the numeric transform: trainer's power loop must
    // follow weights.length, not assume the affine default
    val rows = (1 to 200).map { i =>
      if (i % 2 == 0) ("alpha", 2.0 + (i % 5) * 0.1, 1)
      else ("beta", -2.0 - (i % 5) * 0.1, 2)
    }
    val df = rows.toDF("cat", "x", "label")
    val result = DistributedTrainer.fit(spark, df,
      EncoderSpec(featureDim = 6, mappingPower = 3),
      DistributedTrainer.TrainConfig(
        hidden = Seq(8), classes = 2, labelCol = "label",
        iterations = 6, initialStep = 1.0))
    val h = result.lossHistory
    assert(h.last < h.head * 0.8,
      s"mappingPower=3 loss did not decrease: ${h.head} -> ${h.last}")
    assert(result.state.transforms.values.forall(_.weights.length == 3))
  }

  test("dirty labels fail in prepare with an actionable message") {
    val df = Seq(("a", 1.0, 1), ("b", -1.0, 7)).toDF("cat", "x", "label")
    val state = graft.encode.Encoder.fit(df.drop("label"), EncoderSpec(featureDim = 4))
    val ex = intercept[Exception] {
      DistributedTrainer.prepare(df, state, "label", labelCategories = 2)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("must be in 1..2")),
      s"unhelpful error: ${messages(ex)}")
  }

  test("schedule loop runs stages with sampling without error") {
    val rows = (1 to 500).map { i =>
      if (i % 2 == 0) ("a", 1.0, 1) else ("b", -1.0, 2)
    }
    val df = rows.toDF("cat", "x", "label")
    val result = DistributedTrainer.fit(spark, df,
      EncoderSpec(featureDim = 4),
      DistributedTrainer.TrainConfig(
        hidden = Nil, classes = 2, labelCol = "label",
        iterations = 2, schedule = Seq(0.3, 1.0)))
    assert(result.lossHistory.nonEmpty)
  }
}
