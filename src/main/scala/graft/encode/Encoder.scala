package graft.encode

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.encode.SchemaPaths.{Categorical, FeaturePath, Numeric}

/** The feature-encoding core (reference strata T-1..T-4, E-1, E-9),
  * re-expressed as a single Catalyst projection.
  *
  * The reference encodes row-at-a-time on executors: recursive `Row`
  * walk, MindsEye `ValueLayer`/`LinearActivationLayer`/`SumInputsLayer`
  * per batch (reference `DataframeModeler.scala:102-123`,
  * `ModelingStrategy.scala:96-186`). Here the whole encoding of a row is
  * ONE `Column` expression tree:
  *
  *   - categorical leaf → embedding lookup of key "path=value" (T-1);
  *   - numeric leaf → `W·[1, z]` with `z = (x−μ)/σ_pop` (T-2), as
  *     `zip_with` over weight-array literals — codegen'd, no UDF;
  *   - label leaf → frozen one-hot (T-3) via the same representation map;
  *   - struct reduce → element-wise `zip_with(+)` fold (T-4 sum mode) or
  *     array `concat` (concat mode, the reference's TensorConcatLayer
  *     alternative, `ModelingStrategy.scala:41`).
  *
  * Embedding lookup has two physical strategies, chosen by key count:
  *
  *   - ≤ `maxLiteralKeys`: a map literal + `element_at` — stays inside
  *     whole-stage codegen entirely;
  *   - above that: a broadcast map inside a UDF whose miss-path *computes*
  *     the representation on the fly — init is a pure function of the key
  *     ([[Deterministic.representation]]), so executors never need a
  *     complete key table. That (plus `fitMaxKeys` capping the driver-side
  *     table) is what makes encode viable at 100 TB where the reference's
  *     collect-all-keys `initKeys` (`DataframeModeler.scala:163-170`)
  *     would OOM the driver.
  */
object Encoder {

  sealed trait StructMode
  case object SumReduce extends StructMode
  case object ConcatReduce extends StructMode

  /** Encoder configuration. `labelColumn`/`labelCategories` switch that
    * column's keys to frozen one-hot (reference
    * `CategorizingModelingStrategy.scala:26-41`).
    */
  final case class EncoderSpec(
      featureDim: Int = 10,
      labelColumn: Option[String] = None,
      labelCategories: Int = 0,
      structMode: StructMode = SumReduce,
      maxLiteralKeys: Int = 4096,
      fitMaxKeys: Int = 1 << 20,
      /** Polynomial degree of the numeric transform: out = Σ_p W[p]·z^p
        * for p < mappingPower (2 = the reference's affine W₀ + W₁·z).
        */
      mappingPower: Int = 2)

  /** Immutable model state — the reference's mutable `ModelingData`
    * (`ModelingData.scala:26-29`) snapshotted per iteration instead of
    * mutated under locks (SURVEY §7.4 item 4).
    */
  final case class ModelState(
      spec: EncoderSpec,
      representations: Map[String, Array[Double]],
      transforms: Map[String, NumericTransform]) {

    /** E-9 parity: feature width is static — no `limit(1)` probe job
      * (reference `Trainer.scala:148` runs the encoder to measure it).
      */
    def outputDim(nLeaves: Int): Int = spec.structMode match {
      case SumReduce => spec.featureDim
      case ConcatReduce => nLeaves * spec.featureDim
    }

    def withUpdatedRepresentations(upd: Map[String, Array[Double]]): ModelState =
      copy(representations = representations ++ upd)
  }

  /** T-2 per-path state: population stats + the learned affine weights. */
  final case class NumericTransform(
      path: String, n: Long, mean: Double, stdPop: Double,
      weights: Array[Array[Double]]) {
    def safeStd: Double = if (stdPop == 0.0 || stdPop.isNaN) 1.0 else stdPop
  }

  private def isLabelPath(spec: EncoderSpec, path: String): Boolean =
    spec.labelColumn.exists(l => path == l || path.startsWith(l + "/"))

  /** Initial representation for a key — one-hot for label keys, seeded
    * random elsewhere (reference `CategorizingModelingStrategy.scala:27-41`
    * falling back to `ModelingStrategy.scala:45-57`).
    */
  def initialRepresentation(spec: EncoderSpec, key: String): Array[Double] = {
    val path = key.takeWhile(_ != '=')
    if (isLabelPath(spec, path) && spec.labelCategories > 0)
      Deterministic.oneHot(key.drop(path.length + 1).toInt, spec.labelCategories)
    else Deterministic.representation(key, spec.featureDim)
  }

  /** initKeys parity (reference `DataframeModeler.scala:163-178`) as two
    * declarative jobs: one `explode+distinct` for all categorical keys
    * (cardinality-capped), one aggregate for all numeric stats.
    */
  def fit(df: DataFrame, spec: EncoderSpec = EncoderSpec()): ModelState = {
    val leaves = SchemaPaths.flatten(df.schema)
    val cat = leaves.filter(_.kind == Categorical)
    val num = leaves.filter(_.kind == Numeric)

    val representations: Map[String, Array[Double]] =
      if (cat.isEmpty) Map.empty
      else {
        val keys = KeyDiscovery.keysFrameOf(df, cat.map(p => p.path -> p.column))
          .limit(spec.fitMaxKeys + 1).collect().map(_.getString(0))
        require(keys.length <= spec.fitMaxKeys,
          s"categorical key cardinality exceeds ${spec.fitMaxKeys}; raise " +
            "fitMaxKeys or rely on the on-the-fly deterministic lookup path")
        keys.sorted.map(k => k -> initialRepresentation(spec, k)).toMap
      }

    val transforms: Map[String, NumericTransform] =
      if (num.isEmpty) Map.empty
      else Moments.computeOf(df, num.map(p => p.path -> p.column)).map {
        case (p, s) =>
          p -> NumericTransform(p, s.n, s.mean, s.stdPop,
            Deterministic.transformWeights(p, spec.featureDim,
              spec.mappingPower))
      }

    ModelState(spec, representations, transforms)
  }

  /** The "path=value" key expression for a categorical leaf. */
  private def keyExpr(p: FeaturePath): Column =
    concat(lit(p.path + "="), coalesce(p.column.cast("string"), lit("null")))

  /** Embedding lookup column for one categorical leaf. */
  private def lookupExpr(spark: SparkSession, state: ModelState,
      p: FeaturePath): Column = {
    val key = keyExpr(p)
    val dim =
      if (isLabelPath(state.spec, p.path) && state.spec.labelCategories > 0)
        state.spec.labelCategories
      else state.spec.featureDim
    if (state.representations.size <= state.spec.maxLiteralKeys) {
      // pure-expression path: map literal + element_at, miss → on-the-fly
      // deterministic init via a fallback UDF that only runs on misses.
      // Only THIS leaf's keys go into the literal — embedding the full
      // map once per leaf would multiply plan size by the leaf count.
      val prefix = p.path + "="
      val mapLit = typedLit(state.representations.view
        .filterKeys(_.startsWith(prefix)).mapValues(_.toSeq).toMap)
      val spec = state.spec
      val fallback = udf((k: String) => initialRepresentation(spec, k))
      coalesce(element_at(mapLit, key), fallback(key))
    } else {
      // broadcast path: ONE broadcast per ModelState (cached), misses
      // computed in place
      val bc = broadcastFor(spark, state)
      val spec = state.spec
      val lookup = udf((k: String) =>
        bc.value.getOrElse(k, initialRepresentation(spec, k)).toSeq)
      lookup(key)
    }
  }

  /** Representation broadcasts, cached per ModelState so repeated
    * encodes (line-search probes, long sessions) reuse one broadcast
    * per state snapshot instead of leaking one per categorical leaf per
    * call. Weak keys: when a state snapshot is dropped, its entry — and
    * with it the only strong reference to the Broadcast handle — goes
    * too, letting Spark's ContextCleaner unpersist the blocks.
    */
  private val bcCache = new java.util.WeakHashMap[ModelState,
    org.apache.spark.broadcast.Broadcast[Map[String, Array[Double]]]]

  private def broadcastFor(spark: SparkSession, state: ModelState)
      : org.apache.spark.broadcast.Broadcast[Map[String, Array[Double]]] =
    bcCache.synchronized {
      val cached = bcCache.get(state)
      if (cached != null) cached
      else {
        val bc = spark.sparkContext.broadcast(state.representations)
        bcCache.put(state, bc)
        bc
      }
    }

  /** T-2 as a pure expression: `out[k] = W[0][k] + W[1][k]·z + …`. */
  private def numericExpr(state: ModelState, p: FeaturePath): Column = {
    val t = state.transforms.getOrElse(p.path,
      throw new IllegalStateException(
        s"no fitted transform for numeric path ${p.path}"))
    val z = (p.column.cast("double") - lit(t.mean)) / lit(t.safeStd)
    // null numeric → z = 0 (the column mean), keeping the row encodable
    val zSafe = coalesce(z, lit(0.0))
    val powers = t.weights.indices.map {
      case 0 => lit(1.0)
      case 1 => zSafe
      case i => pow(zSafe, i)
    }
    t.weights.toSeq.zip(powers).map { case (w, pw) =>
      transform(typedLit(w.toSeq), c => c * pw)
    }.reduce((a, b) => zip_with(a, b, (x, y) => x + y))
  }

  /** Per-leaf encoded vector. */
  private def leafExpr(spark: SparkSession, state: ModelState,
      p: FeaturePath): Column = p.kind match {
    case Categorical => lookupExpr(spark, state, p)
    case Numeric => numericExpr(state, p)
  }

  /** T-4: struct reduce over all leaves of the schema. */
  def encodeColumn(spark: SparkSession, state: ModelState,
      leaves: Seq[FeaturePath]): Column = {
    require(leaves.nonEmpty, "nothing encodable in schema")
    // sum-reduce needs equal widths: a one-hot label leaf
    // (labelCategories wide) mixed with featureDim leaves would be
    // silently null-padded by zip_with — fail loudly instead
    if (state.spec.structMode == SumReduce && state.spec.labelCategories > 0
        && state.spec.labelCategories != state.spec.featureDim) {
      val labelLeaves = leaves.filter(p => isLabelPath(state.spec, p.path))
      require(labelLeaves.isEmpty || labelLeaves.size == leaves.size,
        s"cannot sum-reduce label leaves (${state.spec.labelCategories}-wide " +
          s"one-hot) with ${state.spec.featureDim}-wide feature leaves; " +
          "encode the label column in its own frame (drop it here)")
    }
    val exprs = leaves.map(leafExpr(spark, state, _))
    state.spec.structMode match {
      case SumReduce => exprs.reduce((a, b) => zip_with(a, b, (x, y) => x + y))
      case ConcatReduce => concat(exprs: _*)
    }
  }

  /** E-1: encode a frame to a single `array<double>` column named by the
    * caller — schema parity with reference `ModelingStrategy.scala:109-114`.
    * One Catalyst `select`; no RDD hop, no positional zip.
    */
  def evalToDataframe(spark: SparkSession, df: DataFrame, state: ModelState,
      name: String): DataFrame =
    df.select(encodeColumn(spark, state, SchemaPaths.flatten(df.schema)).as(name))
}
