package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column conventions + processing plumbing (north-star
  * surface).
  *
  * Convention: media travels as an opaque `binary` column plus a typed
  * metadata struct (`mime`, `width`, `height`, `duration_ms`,
  * `n_bytes`). EVERY decoder here is REAL: image decode
  * ([[decodeImage]]) and resize ([[resizeImage]]) via `javax.imageio`;
  * audio metadata ([[decodeAudio]]) via `javax.sound.sampled`; video
  * metadata ([[decodeVideo]]) and frame demux ([[frameSampleMp4]]) via
  * the pure-JVM [[VideoMeta]] container walks; and the feature
  * extractors ([[imageHistogram]], [[audioBands]],
  * [[contentFeatures]]) compute deterministic integer features from
  * the actually-decoded rasters/samples — no stubs remain.
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

  /** REAL video metadata decode via [[VideoMeta]] — pure-JVM container
    * parsing (MP4/ISO-BMFF box walk, Matroska/WebM EBML walk), no
    * codec: (width, height, duration_ms, codec id) straight from the
    * container structures. Header-only like the image/audio decoders,
    * so a metadata pass over 100 TB of video reads KBs per object.
    * Null for bytes that are neither container (or corrupt).
    */
  val decodeVideo: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((content: Array[Byte]) =>
      VideoMeta.parse(content)
        .map(m => (m.width, m.height, m.durationMs.toInt, m.codec))
        .orNull)

  /** Decode metadata for a media struct column → filled meta struct.
    * Mimes starting with "image/" go through the REAL `javax.imageio`
    * decoder; "audio/" through the REAL `javax.sound.sampled` parser
    * (duration_ms from the container, falling back to the caller's
    * meta.duration_ms when the parser cannot read the bytes — known
    * metadata is never nulled out; width/height stay null); "video/"
    * through the REAL [[VideoMeta]] container parser (unparseable
    * bytes ⇒ null dims, caller's duration kept). CaseWhen picks ONE codec
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
    val isVideo = mime.startsWith("video/")
    val img = decodeImage(content)
    val aud = decodeAudio(content)
    val vid = decodeVideo(content)
    df.withColumn("decoded",
        struct(
          mime.as("mime"),
          when(isImage, img.getField("_1"))
            .when(isVideo, vid.getField("_1"))
            .otherwise(lit(null).cast(IntegerType)).as("width"),
          when(isImage, img.getField("_2"))
            .when(isVideo, vid.getField("_2"))
            .otherwise(lit(null).cast(IntegerType)).as("height"),
          when(isAudio, coalesce(aud.getField("_3"),
              col(s"$mediaCol.meta.duration_ms")))
            .when(isVideo, coalesce(vid.getField("_3"),
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

  /** REAL image feature extraction: a 3×8-bin RGB color histogram
    * computed from the actual decoded raster (full pixel decode, the
    * real per-image cost a feature pass pays). Channel-major 24-int
    * array: slots [0,8) = red bins (value >> 5), [8,16) = green,
    * [16,24) = blue. Pure integer arithmetic over lossless-decoded
    * pixels, so an oracle can replay every bin exactly
    * (`multimodal_features`). Null for undecodable bytes.
    */
  val imageHistogram: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((content: Array[Byte]) => {
      val img =
        if (content == null) null
        else
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
          catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) null
      else {
        val bins = new Array[Int](24)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            bins(((rgb >> 16) & 0xff) >> 5) += 1
            bins(8 + (((rgb >> 8) & 0xff) >> 5)) += 1
            bins(16 + ((rgb & 0xff) >> 5)) += 1
            x += 1
          }
          y += 1
        }
        bins
      }
    })

  /** REAL audio feature extraction: per-band energy (sum of squared
    * sample values, exact integer) and zero-crossing counts over the
    * PCM samples decoded by the actual `javax.sound.sampled` parser
    * (16-bit PCM, channel 0, container-declared endianness). The
    * sample range splits into `nBands` equal spans (band b =
    * [b·n/nBands, (b+1)·n/nBands), integer floor); a zero crossing is
    * counted at sample i (within-band, i > band start) when
    * `(v[i-1] < 0) != (v[i] < 0)`. All-integer, so an oracle replays
    * it bit-for-bit (`multimodal_audio_features`). Returns
    * (band, sum_sq, zero_crossings) tuples; null for bytes the parser
    * can't read or non-16-bit formats.
    */
  def audioBands(nBands: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((content: Array[Byte]) =>
      if (content == null) null
      else
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(content))
          try {
            val fmt = ais.getFormat
            if (fmt.getSampleSizeInBits != 16 ||
                fmt.getEncoding !=
                  javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) null
            else {
              val bytes = ais.readAllBytes()
              val frameSize = fmt.getFrameSize // channels × 2 bytes
              val n = bytes.length / frameSize
              val samples = new Array[Int](n)
              var i = 0
              while (i < n) { // channel 0 of each frame
                val off = i * frameSize
                samples(i) =
                  if (fmt.isBigEndian)
                    ((bytes(off) << 8) | (bytes(off + 1) & 0xff)).toShort.toInt
                  else
                    ((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort.toInt
                i += 1
              }
              (0 until nBands).map { b =>
                val from = (n.toLong * b / nBands).toInt
                val until = (n.toLong * (b + 1) / nBands).toInt
                var sumSq = 0L
                var zc = 0
                var j = from
                while (j < until) {
                  val v = samples(j)
                  sumSq += v.toLong * v
                  if (j > from && ((samples(j - 1) < 0) != (v < 0))) zc += 1
                  j += 1
                }
                (b, sumSq, zc)
              }
            }
          } finally ais.close()
        } catch { case scala.util.control.NonFatal(_) => null })

  /** REAL generic content features: the byte-value distribution of the
    * content folded into `dim` buckets (bucket = b·dim/256 over the
    * unsigned byte value) and L2-normalized — a deterministic,
    * engine-replayable descriptor for arbitrary binary payloads, and
    * the fixed-dim vector shape [[Similarity]] consumes. This replaces
    * the former hash-seeded Gaussian stub: the vector now actually
    * describes the content (similar byte distributions ⇒ similar
    * vectors), not a PRNG stream.
    */
  def contentFeatures(dim: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(dim > 0 && dim <= 256, s"dim must be in [1,256], got $dim")
    udf((content: Array[Byte]) =>
      if (content == null) null
      else {
        val counts = new Array[Long](dim)
        var i = 0
        while (i < content.length) {
          counts((content(i) & 0xff) * dim / 256) += 1
          i += 1
        }
        val norm = math.sqrt(counts.map(c => c.toDouble * c).sum)
        if (norm == 0) Array.fill(dim)(0.0)
        else counts.map(_ / norm)
      })
  }

  /** REAL frame-sample extraction from MP4 bytes: resolves the sample
    * tables ([[VideoMeta.sampleOffsetsMp4]]) and returns up to `n`
    * evenly-spaced samples as (sample_index, bytes) — sync (key)
    * samples when the container declares them (stss), since only those
    * decode standalone. This is the demux half of frame sampling; the
    * returned bytes are REAL coded samples cut at container-declared
    * offsets, ready for a codec. One row per sampled frame after the
    * caller explodes — the shape a full extractor produces. Empty for
    * bytes without resolvable sample tables.
    */
  def frameSampleMp4(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((content: Array[Byte]) =>
      if (content == null) Seq.empty[(Int, Array[Byte])]
      else {
        val (offs, sync) = VideoMeta.sampleOffsetsMp4(content)
        val picks: Seq[Int] = // 0-based sample indices
          if (sync.nonEmpty) {
            val k = math.min(n, sync.length)
            (0 until k).map(i => sync((sync.length.toLong * i / k).toInt) - 1)
          } else {
            val k = math.min(n, offs.length)
            (0 until k).map(i => (offs.length.toLong * i / k).toInt)
          }
        picks.filter(i => i >= 0 && i < offs.length).map { i =>
          val (off, sz) = offs(i)
          val from = math.min(content.length.toLong, math.max(0L, off)).toInt
          (i, java.util.Arrays.copyOfRange(content, from,
            math.min(content.length, from + sz)))
        }
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
