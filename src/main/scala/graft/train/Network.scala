package graft.train

import graft.encode.Deterministic

/** E-6/E-7: dense classifier + loss math in plain Scala arrays.
  *
  * The reference builds `FullyConnected→Bias→ReLU` hidden layers and a
  * `FullyConnected→Bias→Softmax` head (reference `Trainer.scala:150-159`),
  * then wraps entropy loss with a 0.9 activation clamp and batch-mean
  * (reference `Trainer.scala:161-168`). Here the same architecture is a
  * value type executed inside Spark tasks; there is no MindsEye layer
  * graph — forward/backward are ~40 lines of array math.
  *
  * Loss deviation (documented): plain softmax cross-entropy with batch
  * mean, without the reference's `BoundedActivation(0.9)` clamp — the
  * clamp exists to avoid log(0) in its entropy layer; softmax+CE in one
  * step is numerically stable without it (log-sum-exp form).
  */
final case class DenseLayer(w: Array[Array[Double]], b: Array[Double]) {
  def outDim: Int = b.length
  def inDim: Int = if (w.isEmpty) 0 else w(0).length
}

final case class Network(layers: Vector[DenseLayer]) {
  def inputDim: Int = layers.head.inDim
  def outputDim: Int = layers.last.outDim

  /** Forward pass returning all layer activations (pre-ReLU outputs are
    * not needed: ReLU's gradient only needs the post-activation sign).
    * `acts(0)` = input, `acts(i)` = output of layer i (hidden layers
    * ReLU'd, final layer raw logits).
    */
  def forward(x: Array[Double]): Vector[Array[Double]] = {
    var acts = Vector(x)
    layers.zipWithIndex.foreach { case (l, i) =>
      val in = acts.last
      val out = Array.tabulate(l.outDim) { o =>
        var s = l.b(o)
        val row = l.w(o)
        var j = 0
        while (j < row.length) { s += row(j) * in(j); j += 1 }
        s
      }
      if (i < layers.length - 1) { // hidden: ReLU
        var o = 0
        while (o < out.length) { if (out(o) < 0) out(o) = 0.0; o += 1 }
      }
      acts = acts :+ out
    }
    acts
  }

  /** Softmax probabilities from final-layer logits (log-sum-exp stable). */
  def softmax(logits: Array[Double]): Array[Double] = {
    val m = logits.max
    val e = logits.map(v => math.exp(v - m))
    val s = e.sum
    e.map(_ / s)
  }

  def predict(x: Array[Double]): Array[Double] = softmax(forward(x).last)

  /** Backward pass for softmax cross-entropy against one-hot `label`
    * (0-based). Returns (loss, per-layer (dW, db), dInput).
    */
  def gradients(x: Array[Double], label: Int)
      : (Double, Vector[(Array[Array[Double]], Array[Double])], Array[Double]) = {
    val acts = forward(x)
    val p = softmax(acts.last)
    val loss = -math.log(math.max(p(label), 1e-300))
    // dLogits = p - y
    var delta = p.clone()
    delta(label) -= 1.0
    var grads = Vector.empty[(Array[Array[Double]], Array[Double])]
    var li = layers.length - 1
    while (li >= 0) {
      val l = layers(li)
      val in = acts(li)
      val dW = Array.tabulate(l.outDim)(o => {
        val d = delta(o)
        Array.tabulate(l.inDim)(j => d * in(j))
      })
      val db = delta.clone()
      // propagate to the layer's input: dIn = Wᵀ·delta, then through the
      // previous hidden ReLU (every acts(li) with li>0 is post-ReLU)
      val dIn = new Array[Double](l.inDim)
      var o = 0
      while (o < l.outDim) {
        val d = delta(o); val row = l.w(o)
        var j = 0
        while (j < row.length) { dIn(j) += d * row(j); j += 1 }
        o += 1
      }
      if (li > 0) {
        var j = 0
        while (j < dIn.length) { if (acts(li)(j) <= 0) dIn(j) = 0.0; j += 1 }
      }
      delta = dIn
      grads = (dW, db) +: grads
      li -= 1
    }
    (loss, grads, delta)
  }

  def addScaled(other: Vector[(Array[Array[Double]], Array[Double])],
      alpha: Double): Network =
    Network(layers.zip(other).map { case (l, (dW, db)) =>
      DenseLayer(
        l.w.zip(dW).map { case (r, dr) =>
          r.zip(dr).map { case (v, d) => v + alpha * d } },
        l.b.zip(db).map { case (v, d) => v + alpha * d })
    })
}

object Network {

  /** Deterministic classifier init (reference `Trainer.scala:150-159`
    * shape; init seeded per-layer via the same HMAC scheme as the
    * encoder so runs are reproducible — the reference's layer init is
    * unseeded).
    */
  def classifier(inputDim: Int, hidden: Seq[Int], classes: Int,
      seedPrefix: String = "net"): Network = {
    val sizes = inputDim +: hidden :+ classes
    Network(sizes.sliding(2).zipWithIndex.map { case (Seq(in, out), i) =>
      val rnd = new java.util.Random(Deterministic.seedFor(s"$seedPrefix/$i"))
      val scale = math.sqrt(2.0 / in) // He init for the ReLU stack
      DenseLayer(
        Array.fill(out)(Array.fill(in)(rnd.nextGaussian() * scale)),
        Array.fill(out)(0.0))
    }.toVector)
  }
}
