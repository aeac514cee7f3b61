package graft.llm

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("asMedia builds binary content + typed metadata struct") {
    val df = Seq((1L, "some fake image bytes")).toDF("id", "payload")
      .select(col("id"), Multimodal.asMedia(col("payload"), "image/png").as("m"))
    val schema = df.schema("m").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(schema("content").dataType == org.apache.spark.sql.types.BinaryType)
    val meta = df.select(col("m.meta.mime"), col("m.meta.n_bytes")).collect().head
    assert(meta.getString(0) == "image/png")
    assert(meta.getInt(1) == 21)
  }

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff8800) // non-uniform content
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real image decode reads PNG dimensions from the codec") {
    val df = Seq(
      (1L, pngBytes(123, 77), "image/png"),
      (2L, "not an image".getBytes("UTF-8"), "image/png"),
      (3L, "a video payload".getBytes("UTF-8"), "video/fake"))
      .toDF("id", "payload", "mime")
    val media = df.select(col("id"), col("mime"),
      Multimodal.asMedia(col("payload"), "unused").as("m0"))
      // patch the mime into the meta struct per-row
      .select(col("id"),
        org.apache.spark.sql.functions.struct(
          col("m0.content").as("content"),
          org.apache.spark.sql.functions.struct(
            col("mime"), col("m0.meta.width"), col("m0.meta.height"),
            col("m0.meta.duration_ms"), col("m0.meta.n_bytes")).as("meta"))
          .as("m"))
    val out = Multimodal.withDecodedMeta(media, "m")
      .select(col("id"), col("decoded.width"), col("decoded.height"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2))))).toMap
    assert(out(1L) == Some((123, 77)), s"real PNG dims wrong: $out")
    assert(out(2L).isEmpty, "undecodable image bytes must yield null dims")
    assert(out(3L).isEmpty, "non-container video bytes must yield null dims")
  }

  test("real image resize scales long edge to maxDim and re-encodes") {
    val df = Seq((1L, pngBytes(200, 100))).toDF("id", "payload")
      .select(col("id"), Multimodal.resizeImage(50)(col("payload")).as("r"))
    val r = df.select(col("r._1"), col("r._2"), col("r._3")).collect().head
    assert(r.getInt(0) == 50 && r.getInt(1) == 25, "aspect-preserving scale")
    val resized = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](2)))
    assert(resized.getWidth == 50 && resized.getHeight == 25,
      "re-encoded bytes must decode to the new dimensions")
    // never upscale
    val small = Seq((1L, pngBytes(30, 20))).toDF("id", "payload")
      .select(Multimodal.resizeImage(50)(col("payload")).as("r"))
      .select(col("r._1"), col("r._2")).collect().head
    assert(small.getInt(0) == 30 && small.getInt(1) == 20)
  }

  test("real video decode reads MP4 and WebM container metadata") {
    val mp4 = VideoMeta.buildMp4(640, 360, 2500L, codec = "avc1")
    val webm = VideoMeta.buildWebm(1280, 720, 4000L, codec = "V_VP9")
    val df = Seq((1L, mp4), (2L, webm), (3L, null))
      .toDF("id", "payload")
      .select(col("id"), Multimodal.asMedia(col("payload"), "video/mp4").as("m"))
    val out = Multimodal.withDecodedMeta(df, "m")
      .select(col("id"), col("decoded.width"), col("decoded.height"),
        col("decoded.duration_ms"))
      .collect()
    val byId = out.map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None
       else Some((r.getInt(1), r.getInt(2), r.getInt(3))))).toMap
    assert(byId(1L) == Some((640, 360, 2500)), s"mp4: $byId")
    assert(byId(2L) == Some((1280, 720, 4000)), s"webm: $byId")
    assert(byId(3L).isEmpty) // null content -> null dims
  }

  test("content features produce fixed-dim vectors usable by Similarity") {
    val df = Seq((1L, "payload one"), (2L, "zzzz!!!!####")).toDF("id", "payload")
      .select(col("id"),
        Multimodal.contentFeatures(16)(col("payload").cast("binary")).as("vec"))
    val rows = df.collect()
    assert(rows.forall(_.getSeq[Double](1).length == 16))
    val top = Similarity.topKBrute(df, "vec", "id",
      rows.head.getSeq[Double](1).toArray, 1).collect()
    assert(top.head.getLong(0) == 1L) // self-similarity wins
  }

  test("image histogram counts actual raster pixels per channel bin") {
    // 4×2 image: 5 pure-red pixels (255,0,0), 3 mid-gray (100,100,100)
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (i <- 0 until 8) {
      val rgb = if (i < 5) 0xff0000 else 0x646464
      img.setRGB(i % 4, i / 4, rgb)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val bins = Seq(Tuple1(bos.toByteArray)).toDF("png")
      .select(Multimodal.imageHistogram(col("png")))
      .collect().head.getSeq[Int](0)
    assert(bins.length == 24)
    assert(bins(7) == 5, s"red bin 7 (255>>5): $bins") // red channel, 255
    assert(bins(3) == 3, s"red bin 3 (100>>5): $bins") // red channel, 100
    assert(bins(8) == 5, s"green bin 0 (0>>5): $bins") // green, 0
    assert(bins(8 + 3) == 3) // green, 100
    assert(bins(16) == 5) // blue, 0
    assert(bins(16 + 3) == 3) // blue, 100
    assert(bins.sum == 3 * 8) // every pixel votes once per channel
  }

  test("audio bands compute exact integer energy and zero crossings") {
    // 8 samples alternating +1000/-1000 → every step is a crossing
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](16)
    for (i <- 0 until 8) {
      val v: Short = if (i % 2 == 0) 1000 else -1000
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 8L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val bands = Seq(Tuple1(bos.toByteArray)).toDF("wav")
      .select(Multimodal.audioBands(2)(col("wav")).as("b"))
      .select(org.apache.spark.sql.functions.explode(col("b")).as("band"))
      .select(col("band._1"), col("band._2"), col("band._3"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSeq
    // each band: 4 samples of 1000² energy, 3 within-band crossings
    assert(bands == Seq((0, 4000000L, 3), (1, 4000000L, 3)))
  }

  test("frame sampling extracts real sample bytes from MP4 tables") {
    // 12 distinct coded samples; the demux must cut exactly these byte
    // ranges back out of the container
    val samples = (0 until 12).map(i =>
      Array.fill[Byte](32 + i)((0x40 + i).toByte))
    val mp4 = VideoMeta.buildMp4(320, 240, 1200L, samples = samples)
    val df = Seq((1L, mp4)).toDF("id", "payload")
      .select(col("id"),
        org.apache.spark.sql.functions.explode(
          Multimodal.frameSampleMp4(4)(col("payload")))
          .as("frame"))
      .select(col("id"), col("frame._1").as("idx"), col("frame._2").as("bytes"))
    val rows = df.collect()
    assert(rows.length == 4)
    val idxs = rows.map(_.getInt(1)).toSeq
    assert(idxs == Seq(0, 3, 6, 9), s"evenly spaced, got $idxs")
    rows.foreach { r =>
      val i = r.getInt(1)
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]](2), samples(i)),
        s"sample $i bytes must match what the container carried")
    }
    // non-container bytes -> no frames, not a crash
    val empty = Seq((1L, "not a video".getBytes("UTF-8"))).toDF("id", "p")
      .select(Multimodal.frameSampleMp4(4)(col("p")).as("f"))
      .collect().head.getSeq[Any](0)
    assert(empty.isEmpty)
  }

  test("real WAV bytes round-trip through the javax.sound parser") {
    // 0.5 s of 16-bit mono PCM at 8 kHz, written as a real WAV container
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val frames = 4000
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](frames * 2)),
      fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val df = Seq((1L, bos.toByteArray)).toDF("id", "payload")
      .select(col("id"), Multimodal.asMedia(col("payload"), "audio/wav").as("m"))
    val meta = Multimodal.withDecodedMeta(df, "m")
      .select(col("decoded.duration_ms"), col("decoded.width")).collect().head
    assert(meta.getInt(0) == 500) // 4000 frames / 8 kHz = 500 ms
    assert(meta.isNullAt(1)) // audio has no spatial dims
    val a = df.select(Multimodal.decodeAudio(col("m.content")).as("a"))
      .select(col("a._1"), col("a._2")).collect().head
    assert(a.getInt(0) == 8000 && a.getInt(1) == 1)
  }

  test("unrecognizable audio bytes decode to null, not a crash") {
    val df = Seq((1L, "definitely not audio")).toDF("id", "payload")
      .select(Multimodal.decodeAudio(col("payload").cast("binary")).as("a"))
    assert(df.collect().head.isNullAt(0))
  }

  test("byte-based repartition sizes by data volume not rows") {
    // 10 rows x 1 MiB payloads, 2 MiB target -> 5 partitions regardless
    // of the row count; size measured from the media column itself
    val df = (1 to 10).map(i => (i.toLong, "x" * (1 << 20))).toDF("id", "payload")
      .select(col("id"), Multimodal.asMedia(col("payload"), "video/fake").as("m"))
    val repart = Multimodal.repartitionByBytes(df, "m",
      targetBytesPerPartition = 2L << 20)
    assert(repart.rdd.getNumPartitions == 5)
  }
}
