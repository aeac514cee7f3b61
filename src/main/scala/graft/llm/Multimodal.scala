package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column conventions + processing plumbing (north-star
  * surface).
  *
  * Convention: media travels as an opaque `binary` column plus a typed
  * metadata struct (`mime`, `width`, `height`, `duration_ms`,
  * `n_bytes`). All Spark-side plumbing — schema, batch shape,
  * partition sizing — is real; the actual codec work is STUBBED behind
  * [[decodeStub]] (this container ships no image/audio libraries) with
  * a deterministic fake so pipelines and tests exercise the full path.
  */
object Multimodal {

  val MetadataSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", IntegerType),
    StructField("n_bytes", IntegerType)))

  /** Wrap a text/binary source column as (content binary, meta struct)
    * — the ingestion shape.
    */
  def asMedia(content: Column, mime: String): Column =
    struct(
      content.cast(BinaryType).as("content"),
      struct(
        lit(mime).as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("duration_ms"),
        length(content.cast(BinaryType)).cast(IntegerType).as("n_bytes"))
        .as("meta"))

  /** STUB decode — deterministic fake dimensions derived from the
    * content hash, standing in for a real image decoder (library absent
    * in this environment; swap the body for e.g. javax.imageio /
    * a JNI codec in production). The signature, null-safety, and
    * batch shape are the real contract.
    */
  val decodeStub: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((content: Array[Byte]) =>
      if (content == null) null
      else {
        var h = 1125899906842597L
        content.take(1024).foreach(b => h = 31 * h + b)
        // fake but stable dims: 64..1087 px
        val w = 64 + math.abs(h % 1024).toInt
        val ht = 64 + math.abs((h >> 10) % 1024).toInt
        (w, ht, 3)
      })

  /** Decode metadata for a media struct column → filled meta struct. */
  def withDecodedMeta(df: DataFrame, mediaCol: String): DataFrame = {
    val decoded = decodeStub(col(s"$mediaCol.content"))
    df.withColumn("decoded",
        struct(
          col(s"$mediaCol.meta.mime").as("mime"),
          decoded.getField("_1").as("width"),
          decoded.getField("_2").as("height"),
          col(s"$mediaCol.meta.duration_ms").as("duration_ms"),
          col(s"$mediaCol.meta.n_bytes").as("n_bytes")))
  }

  /** STUB feature extraction: a deterministic `dim`-wide embedding from
    * content bytes (stands in for a vision/audio encoder). Plumbing is
    * real: one pass, arrays ready for [[Similarity]].
    */
  def featureStub(dim: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((content: Array[Byte]) =>
      if (content == null) null
      else {
        val rnd = new java.util.Random(
          content.take(1024).foldLeft(0L)((h, b) => 31 * h + b))
        Array.fill(dim)(rnd.nextGaussian())
      })

  /** STUB resize: deterministic fake downscale — emits new dimensions
    * and a content hash standing in for re-encoded bytes (real impl:
    * image codec). Signature/batch shape are the contract.
    */
  def resizeStub(maxDim: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((content: Array[Byte], w: java.lang.Integer, h: java.lang.Integer) =>
      if (content == null || w == null || h == null) null
      else {
        val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
        val nw = math.max(1, (w * scale).toInt)
        val nh = math.max(1, (h * scale).toInt)
        val fakeBytes = java.util.Arrays.copyOf(content,
          math.min(content.length, math.max(16, content.length * nw / math.max(w, 1))))
        (nw, nh, fakeBytes)
      })

  /** STUB frame sampling: pick `n` deterministic offsets from a fake
    * video payload → one row per sampled frame (the explode shape a
    * real frame extractor produces; real impl: container demuxer).
    */
  def frameSampleStub(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((content: Array[Byte]) =>
      if (content == null) Seq.empty[(Int, Array[Byte])]
      else (0 until n).map { i =>
        val off = if (content.length <= 1) 0 else (content.length.toLong * i / n).toInt
        (i, java.util.Arrays.copyOfRange(content, off,
          math.min(content.length, off + 64)))
      })

  /** Size-aware repartition for media processing: target bytes per
    * partition (decode memory is proportional to bytes, not rows —
    * row-count partitioning under-sizes for video, over-sizes for
    * thumbnails). Total size is measured from the media column itself
    * (one aggregate job over the content lengths).
    */
  def repartitionByBytes(df: DataFrame, mediaCol: String,
      targetBytesPerPartition: Long = 128L << 20): DataFrame = {
    val totalBytes = df
      .agg(sum(coalesce(length(col(s"$mediaCol.content")), lit(0)))
        .cast("long"))
      .collect().head match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    df.repartition(
      math.max((totalBytes / targetBytesPerPartition).toInt, 2))
  }
}
