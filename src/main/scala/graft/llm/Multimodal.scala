package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column conventions + processing plumbing (north-star
  * surface).
  *
  * Convention: media travels as an opaque `binary` column plus a typed
  * metadata struct (`mime`, `width`, `height`, `duration_ms`,
  * `n_bytes`). IMAGE decode ([[decodeImage]]) and resize
  * ([[resizeImage]]) are REAL — `javax.imageio` ships with the JDK, so
  * PNG/JPEG/BMP/GIF dimensions come from the actual codec (header-only
  * read, no pixel decode) and resize re-encodes actual pixels. AUDIO
  * metadata ([[decodeAudio]]) is REAL too — `javax.sound.sampled`
  * parses WAV/AIFF/AU headers from the JDK. Only VIDEO remains STUBBED
  * behind [[decodeStub]] / [[frameSampleStub]] (no demuxer library in
  * this container) with a deterministic fake so pipelines and tests
  * exercise the full path.
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

  /** REAL image decode via `javax.imageio`: (width, height, channels)
    * from the actual codec. Reads only the header — `ImageReader
    * .getWidth/getHeight` never decodes pixel data for PNG/JPEG/BMP/GIF
    * — so cost per row is O(header), not O(pixels): the property that
    * lets a metadata pass over 100 TB of images run at scan speed.
    * Returns null for bytes no installed reader recognizes.
    */
  val decodeImage: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((content: Array[Byte]) =>
      if (content == null) null
      else {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(content))
        if (iis == null) null // no ImageInputStream SPI available
        else {
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) null
            else {
              val r = readers.next()
              try {
                r.setInput(iis)
                val bands =
                  try r.getRawImageType(0) match {
                    case null => 3
                    case t => t.getNumBands
                  } catch { case _: Exception => 3 }
                (r.getWidth(0), r.getHeight(0), bands)
              } finally r.dispose()
            }
            // NonFatal, not just IOException: codecs throw runtime
            // exceptions on corrupt headers, and one bad blob must not
            // fail the whole job — unreadable ⇒ null, as documented
          } catch { case scala.util.control.NonFatal(_) => null }
          finally iis.close()
        }
      })

  /** REAL audio metadata decode via `javax.sound.sampled` (ships with
    * the JDK): (sample_rate_hz, channels, duration_ms) from the actual
    * container parser — WAV/AIFF/AU out of the box. Header-only
    * (`getAudioFileFormat` reads no sample data), so a metadata pass
    * runs at scan speed like the image decoder. Null for bytes no
    * installed provider recognizes.
    */
  val decodeAudio: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((content: Array[Byte]) =>
      if (content == null) null
      else
        try {
          val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new java.io.ByteArrayInputStream(content))
          val fmt = aff.getFormat
          val frames = aff.getFrameLength
          val durMs =
            if (frames < 0 || fmt.getFrameRate <= 0) null
            else Int.box(math.round(frames * 1000.0 / fmt.getFrameRate).toInt)
          (math.round(fmt.getSampleRate).toInt, fmt.getChannels, durMs)
        } catch { case scala.util.control.NonFatal(_) => null })

  /** STUB decode for video — deterministic fake dimensions derived
    * from the content hash, standing in for a demuxer (no video
    * container library in this environment; swap the body for a real
    * one in production). The signature, null-safety, and batch shape
    * are the real contract.
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

  /** Decode metadata for a media struct column → filled meta struct.
    * Mimes starting with "image/" go through the REAL `javax.imageio`
    * decoder; "audio/" through the REAL `javax.sound.sampled` parser
    * (duration_ms from the container, falling back to the caller's
    * meta.duration_ms when the parser cannot read the bytes — known
    * metadata is never nulled out; width/height stay null); video
    * falls back to the documented stub. CaseWhen picks ONE codec
    * FAMILY per row; field extraction may re-evaluate the chosen
    * codec's UDF once per projected field unless whole-stage codegen's
    * subexpression elimination merges them — all decoders here are
    * header-only, so the worst case is a small constant factor on an
    * O(header) parse, not a pixel decode.
    */
  def withDecodedMeta(df: DataFrame, mediaCol: String): DataFrame = {
    val mime = col(s"$mediaCol.meta.mime")
    val content = col(s"$mediaCol.content")
    val isImage = mime.startsWith("image/")
    val isAudio = mime.startsWith("audio/")
    val img = decodeImage(content)
    val aud = decodeAudio(content)
    val vid = decodeStub(content)
    df.withColumn("decoded",
        struct(
          mime.as("mime"),
          when(isImage, img.getField("_1"))
            .when(isAudio, lit(null).cast(IntegerType))
            .otherwise(vid.getField("_1")).as("width"),
          when(isImage, img.getField("_2"))
            .when(isAudio, lit(null).cast(IntegerType))
            .otherwise(vid.getField("_2")).as("height"),
          when(isAudio, coalesce(aud.getField("_3"),
              col(s"$mediaCol.meta.duration_ms")))
            .otherwise(col(s"$mediaCol.meta.duration_ms")).as("duration_ms"),
          col(s"$mediaCol.meta.n_bytes").as("n_bytes")))
  }

  /** REAL image resize: decode, scale the long edge down to `maxDim`
    * (never upscale), re-encode as PNG. Returns (width, height, bytes);
    * null when the bytes aren't a decodable image. Pixel work is real —
    * use [[repartitionByBytes]] upstream so partition memory tracks
    * image bytes.
    */
  def resizeImage(maxDim: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((content: Array[Byte]) => {
      val img =
        if (content == null) null
        else
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
          catch { case _: java.io.IOException => null }
      if (img == null) null
      else {
        val scale = math.min(1.0,
          maxDim.toDouble / math.max(img.getWidth, img.getHeight))
        val nw = math.max(1, math.round(img.getWidth * scale).toInt)
        val nh = math.max(1, math.round(img.getHeight * scale).toInt)
        val out = new java.awt.image.BufferedImage(nw, nh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, nw, nh, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        (nw, nh, bos.toByteArray)
      }
    })

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
