package graft.llm

/** Pure-JVM video CONTAINER parsing — no codec, no native library.
  *
  * Two families cover the overwhelming share of crawled video:
  *   - MP4 / ISO-BMFF (ISO 14496-12): length-prefixed box tree.
  *     `mvhd` carries movie timescale+duration, `tkhd` the track's
  *     presentation size (16.16 fixed point), `hdlr` identifies the
  *     video track, `stsd` the codec fourcc (avc1/hvc1/av01/…).
  *   - Matroska / WebM: EBML element tree. Segment→Info carries
  *     TimestampScale (ns/tick, default 1e6) + Duration (float ticks);
  *     Segment→Tracks→TrackEntry carries TrackType (1 = video),
  *     CodecID (V_VP9/V_AV1/…) and Video{PixelWidth, PixelHeight}.
  *
  * Everything here is header-only — a metadata pass over 100 TB of
  * video reads a few KB per object, never sample data; the byte
  * budget is the same class as the image/audio decoders
  * ([[Multimodal.decodeImage]], [[Multimodal.decodeAudio]]).
  *
  * [[sampleOffsetsMp4]] goes one step further — a demuxer-lite: it
  * resolves the `stbl` sample tables (stsz/stsc/stco|co64, stss) to
  * absolute byte ranges of individual samples, so frame-level bytes
  * can be extracted WITHOUT decoding (the extraction half of frame
  * sampling; turning a sample into pixels still needs a codec).
  *
  * [[buildMp4]] / [[buildWebm]] write minimal spec-layout containers —
  * the synthesis side of oracle queries and specs (the
  * `multimodal_audio` pattern: predictable metadata in, parser must
  * recover it).
  */
object VideoMeta {

  final case class Meta(width: Int, height: Int, durationMs: Long,
    codec: String)

  /** Parse MP4/ISO-BMFF or Matroska/WebM metadata; None when the bytes
    * are neither (or the container is corrupt — never throws). */
  def parse(bytes: Array[Byte]): Option[Meta] =
    try {
      if (bytes == null || bytes.length < 12) None
      else if (bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' &&
        bytes(7) == 'p') parseMp4(bytes)
      else if ((bytes(0) & 0xff) == 0x1A && (bytes(1) & 0xff) == 0x45 &&
        (bytes(2) & 0xff) == 0xDF && (bytes(3) & 0xff) == 0xA3)
        parseMkv(bytes)
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

  // ---------------------------------------------------------------- MP4

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** (type, payloadStart, payloadEnd) for each box in [from, until) —
    * handles 64-bit largesize (size==1) and to-end boxes (size==0);
    * stops cleanly at a corrupt length. */
  private def boxes(b: Array[Byte], from: Int,
      until: Int): List[(String, Int, Int)] = {
    val out = List.newBuilder[(String, Int, Int)]
    var o = from
    var ok = true
    while (ok && o + 8 <= until) {
      val size = u32(b, o)
      val typ = fourcc(b, o + 4)
      val (hdr, end) =
        if (size == 1 && o + 16 <= until) (16, o + u64(b, o + 8))
        else if (size == 0) (8, until.toLong)
        else (8, o + size)
      if (end < o + hdr || end > until) ok = false
      else {
        out += ((typ, o + hdr, end.toInt))
        o = end.toInt
      }
    }
    out.result()
  }

  private def child(b: Array[Byte], from: Int, until: Int,
      name: String): Option[(Int, Int)] =
    boxes(b, from, until).collectFirst { case (`name`, s, e) => (s, e) }

  private def parseMp4(b: Array[Byte]): Option[Meta] =
    child(b, 0, b.length, "moov").flatMap { case (ms, me) =>
      val durMs = child(b, ms, me, "mvhd").map { case (s, _) =>
        val (ts, dur) =
          if ((b(s) & 0xff) == 1) (u32(b, s + 20), u64(b, s + 24))
          else (u32(b, s + 12), u32(b, s + 16))
        if (ts > 0) dur * 1000 / ts else 0L
      }.getOrElse(0L)
      // the video track: prefer hdlr=='vide', else any track with a
      // nonzero tkhd presentation size
      val traks = boxes(b, ms, me).collect { case ("trak", s, e) => (s, e) }
      def handler(s: Int, e: Int): Option[String] = for {
        (ms2, me2) <- child(b, s, e, "mdia")
        (hs, _) <- child(b, ms2, me2, "hdlr")
      } yield fourcc(b, hs + 8)
      def dims(s: Int, e: Int): Option[(Int, Int)] =
        child(b, s, e, "tkhd").map { case (ts, _) =>
          val off = if ((b(ts) & 0xff) == 1) ts + 88 else ts + 76
          ((u32(b, off) >> 16).toInt, (u32(b, off + 4) >> 16).toInt)
        }
      def codec(s: Int, e: Int): Option[String] = for {
        (a, ae) <- child(b, s, e, "mdia")
        (c, ce) <- child(b, a, ae, "minf")
        (d, de) <- child(b, c, ce, "stbl")
        (f, fe) <- child(b, d, de, "stsd")
        if fe >= f + 16 && u32(b, f + 4) >= 1
      } yield fourcc(b, f + 12)
      val vid = traks.find(t => handler(t._1, t._2).contains("vide"))
        .orElse(traks.find(t => dims(t._1, t._2).exists(_._1 > 0)))
      vid.flatMap { case (s, e) =>
        dims(s, e).map { case (w, h) =>
          Meta(w, h, durMs, codec(s, e).getOrElse("unknown"))
        }
      }
    }

  /** Absolute (offset, size) of every sample in the MP4's video track,
    * plus the 1-based indices of its sync (key) samples — resolved from
    * stsz/stsc/stco|co64/stss. Empty when any required table is absent.
    */
  def sampleOffsetsMp4(
      b: Array[Byte]): (Array[(Long, Int)], Array[Int]) = {
    val none = (Array.empty[(Long, Int)], Array.empty[Int])
    try {
      val stbl = for {
        (ms, me) <- child(b, 0, b.length, "moov")
        trak <- boxes(b, ms, me).collectFirst { case ("trak", s, e) => (s, e) }
        (a, ae) <- child(b, trak._1, trak._2, "mdia")
        (c, ce) <- child(b, a, ae, "minf")
        (d, de) <- child(b, c, ce, "stbl")
      } yield (d, de)
      stbl match {
        case None => none
        case Some((ss, se)) =>
          // every declared count must FIT the box's actual byte extent
          // — a corrupt count would otherwise size a multi-GB array
          // allocation (an Error, not an Exception) from 4 flipped
          // bytes. A short table ⇒ treat as absent.
          def checked(declared: Long, s: Int, e: Int, headerLen: Int,
              entryLen: Int): Option[Int] = {
            val fit = (e - s - headerLen).toLong / entryLen
            if (declared >= 0 && declared <= fit) Some(declared.toInt)
            else None
          }
          val sizes = child(b, ss, se, "stsz").flatMap { case (s, e) =>
            val fixed = u32(b, s + 4)
            val declared = u32(b, s + 8)
            if (fixed != 0) {
              if (declared <= (1L << 24)) Some(Array.fill(declared.toInt)(
                fixed.toInt))
              else None
            } else checked(declared, s, e, 12, 4).map(n =>
              Array.tabulate(n)(i => u32(b, s + 12 + 4 * i).toInt))
          }
          val chunkOffs = child(b, ss, se, "stco").flatMap { case (s, e) =>
            checked(u32(b, s + 4), s, e, 8, 4).map(n =>
              Array.tabulate(n)(i => u32(b, s + 8 + 4 * i)))
          }.orElse(child(b, ss, se, "co64").flatMap { case (s, e) =>
            checked(u32(b, s + 4), s, e, 8, 8).map(n =>
              Array.tabulate(n)(i => u64(b, s + 8 + 8 * i)))
          })
          val stsc = child(b, ss, se, "stsc").flatMap { case (s, e) =>
            checked(u32(b, s + 4), s, e, 8, 12).map(n =>
              Array.tabulate(n) { i =>
                (u32(b, s + 8 + 12 * i).toInt,
                  u32(b, s + 12 + 12 * i).toInt)
              }) // (first_chunk 1-based, samples_per_chunk)
          }
          val sync = child(b, ss, se, "stss").flatMap { case (s, e) =>
            checked(u32(b, s + 4), s, e, 8, 4).map(n =>
              Array.tabulate(n)(i => u32(b, s + 8 + 4 * i).toInt))
          }.getOrElse(Array.empty[Int])
          (sizes, chunkOffs, stsc) match {
            case (Some(sz), Some(co), Some(sc))
                if sc.nonEmpty && sz.forall(_ >= 0) =>
              val out = new Array[(Long, Int)](sz.length)
              var sample = 0
              var chunk = 0
              while (chunk < co.length && sample < sz.length) {
                // samples-per-chunk of the last stsc entry whose
                // first_chunk covers this chunk
                var spc = sc(0)._2
                var k = 0
                while (k < sc.length && sc(k)._1 <= chunk + 1) {
                  spc = sc(k)._2; k += 1
                }
                var off = co(chunk)
                var j = 0
                while (j < spc && sample < sz.length) {
                  out(sample) = (off, sz(sample))
                  off += sz(sample)
                  sample += 1
                  j += 1
                }
                chunk += 1
              }
              (out.take(sample), sync)
            case _ => none
          }
      }
    } catch { case scala.util.control.NonFatal(_) => none }
  }

  // ----------------------------------------------------------- Matroska

  private object Ebml {
    val Segment = 0x18538067L
    val Info = 0x1549A966L
    val TimestampScale = 0x2AD7B1L
    val Duration = 0x4489L
    val Tracks = 0x1654AE6BL
    val TrackEntry = 0xAEL
    val TrackType = 0x83L
    val CodecID = 0x86L
    val Video = 0xE0L
    val PixelWidth = 0xB0L
    val PixelHeight = 0xBAL
  }

  /** One EBML element at `o`: (id-with-marker, dataStart, dataEnd). */
  private def ebmlElem(b: Array[Byte], o: Int,
      until: Int): Option[(Long, Int, Int)] = {
    if (o >= until) return None
    val first = b(o) & 0xff
    if (first == 0) return None
    val idLen = Integer.numberOfLeadingZeros(first) - 23
    if (idLen < 1 || idLen > 4 || o + idLen > until) return None
    var id = 0L
    var i = 0
    while (i < idLen) { id = (id << 8) | (b(o + i) & 0xff); i += 1 }
    var p = o + idLen
    if (p >= until) return None
    val sFirst = b(p) & 0xff
    if (sFirst == 0) return None
    val sLen = Integer.numberOfLeadingZeros(sFirst) - 23
    if (sLen < 1 || sLen > 8 || p + sLen > until) return None
    var size = (sFirst & (0xff >>> sLen)).toLong
    i = 1
    while (i < sLen) { size = (size << 8) | (b(p + i) & 0xff); i += 1 }
    p += sLen
    val unknown = size == (1L << (7 * sLen)) - 1
    val end =
      if (unknown) until
      else math.min(until.toLong, p + size).toInt
    Some((id, p, end))
  }

  private def ebmlChildren(b: Array[Byte], from: Int,
      until: Int): List[(Long, Int, Int)] = {
    val out = List.newBuilder[(Long, Int, Int)]
    var o = from
    var go = true
    while (go) ebmlElem(b, o, until) match {
      case Some((id, s, e)) if e > o => out += ((id, s, e)); o = e
      case _ => go = false
    }
    out.result()
  }

  private def ebmlUint(b: Array[Byte], s: Int, e: Int): Long = {
    var v = 0L
    var i = s
    while (i < e) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    v
  }
  private def ebmlFloat(b: Array[Byte], s: Int, e: Int): Double =
    (e - s) match {
      case 4 => java.lang.Float.intBitsToFloat(ebmlUint(b, s, e).toInt)
        .toDouble
      case 8 => java.lang.Double.longBitsToDouble(ebmlUint(b, s, e))
      case _ => 0.0
    }

  private def parseMkv(b: Array[Byte]): Option[Meta] = {
    val top = ebmlChildren(b, 0, b.length)
    top.collectFirst { case (Ebml.Segment, s, e) => (s, e) }.flatMap {
      case (ss, se) =>
        val seg = ebmlChildren(b, ss, se)
        var scaleNs = 1000000L // EBML default: 1 ms ticks
        var durTicks = 0.0
        seg.collectFirst { case (Ebml.Info, s, e) => (s, e) }.foreach {
          case (is, ie) => ebmlChildren(b, is, ie).foreach {
            case (Ebml.TimestampScale, s, e) => scaleNs = ebmlUint(b, s, e)
            case (Ebml.Duration, s, e) => durTicks = ebmlFloat(b, s, e)
            case _ => ()
          }
        }
        val video = for {
          (ts, te) <- seg.collectFirst { case (Ebml.Tracks, s, e) => (s, e) }
          entry <- ebmlChildren(b, ts, te).collect {
            case (Ebml.TrackEntry, s, e) => ebmlChildren(b, s, e)
          }.find(_.exists {
            case (Ebml.TrackType, s, e) => ebmlUint(b, s, e) == 1L
            case _ => false
          })
        } yield entry
        video.flatMap { fields =>
          val codec = fields.collectFirst { case (Ebml.CodecID, s, e) =>
            new String(b, s, e - s,
              java.nio.charset.StandardCharsets.ISO_8859_1)
          }.getOrElse("unknown")
          fields.collectFirst { case (Ebml.Video, s, e) => (s, e) }
            .flatMap { case (vs, ve) =>
              val vf = ebmlChildren(b, vs, ve)
              for {
                w <- vf.collectFirst { case (Ebml.PixelWidth, s, e) =>
                  ebmlUint(b, s, e).toInt }
                h <- vf.collectFirst { case (Ebml.PixelHeight, s, e) =>
                  ebmlUint(b, s, e).toInt }
              } yield Meta(w, h,
                math.round(durTicks * scaleNs / 1e6), codec)
            }
        }
    }
  }

  // ----------------------------------------------------------- builders

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++
      typ.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ body
  }

  private val UnityMatrix: Array[Byte] =
    be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L)

  /** Minimal spec-layout MP4: ftyp + moov(mvhd, trak(tkhd, mdia(hdlr,
    * minf(stbl(stsd[fourcc], stsz, stsc, stco))))) + mdat carrying
    * `samples`. Timescale 1000 ⇒ mvhd duration == durationMs. The stco
    * offset is the real absolute mdat payload position, so
    * [[sampleOffsetsMp4]] resolves true byte ranges.
    */
  def buildMp4(width: Int, height: Int, durationMs: Long,
      codec: String = "avc1",
      samples: Seq[Array[Byte]] = Seq.empty): Array[Byte] = {
    val mvhd = box("mvhd",
      be32(0), // version 0 + flags
      be32(0), be32(0), // ctime, mtime
      be32(1000), be32(durationMs), // timescale=1000: duration in ms
      be32(0x00010000L), be16(0x0100), be16(0), be32(0), be32(0),
      UnityMatrix,
      Array.fill[Byte](24)(0), // pre_defined
      be32(2)) // next track id
    val tkhd = box("tkhd",
      be32(7), // version 0, flags: enabled|in_movie|in_preview
      be32(0), be32(0), be32(1), be32(0), be32(durationMs),
      Array.fill[Byte](8)(0), be16(0), be16(0), be16(0), be16(0),
      UnityMatrix,
      be32(width.toLong << 16), be32(height.toLong << 16))
    val hdlr = box("hdlr",
      be32(0), be32(0),
      "vide".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
      Array.fill[Byte](12)(0), Array[Byte](0))
    val entry = box(codec, Array.fill[Byte](8)(0))
    val stsd = box("stsd", be32(0), be32(1), entry)
    val stsz = box("stsz", be32(0), be32(0), be32(samples.length),
      samples.flatMap(s => be32(s.length)).toArray)
    val stsc =
      if (samples.isEmpty) box("stsc", be32(0), be32(0))
      else box("stsc", be32(0), be32(1),
        be32(1), be32(samples.length), be32(1)) // one chunk, all samples
    def stco(off: Long) =
      if (samples.isEmpty) box("stco", be32(0), be32(0))
      else box("stco", be32(0), be32(1), be32(off))
    def moov(mdatPayloadOff: Long) = box("moov", mvhd,
      box("trak", tkhd,
        box("mdia", hdlr,
          box("minf",
            box("stbl", stsd, stsz, stsc, stco(mdatPayloadOff))))))
    val ftyp = box("ftyp",
      "isom".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
      be32(0x200),
      "isom".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    // stco needs the absolute mdat payload offset, which depends on the
    // moov length — build moov once with 0 to measure, then for real
    val probe = moov(0)
    val mdatOff = ftyp.length + probe.length + 8L
    ftyp ++ moov(mdatOff) ++ box("mdat", samples.flatten.toArray)
  }

  private def ebmlId(id: Long): Array[Byte] = {
    val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    (1 to n).map(i => ((id >> (8 * (n - i))) & 0xff).toByte).toArray
  }
  private def ebmlSize(v: Long, len: Int): Array[Byte] = {
    val marked = v | (1L << (7 * len))
    (1 to len).map(i => ((marked >> (8 * (len - i))) & 0xff).toByte).toArray
  }
  private def elem(id: Long, body: Array[Byte]*): Array[Byte] = {
    val b = body.flatten.toArray
    ebmlId(id) ++ ebmlSize(b.length, 2) ++ b
  }
  private def uintBody(v: Long): Array[Byte] = {
    val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    (1 to n).map(i => ((v >> (8 * (n - i))) & 0xff).toByte).toArray
  }

  /** Minimal Matroska/WebM: EBML header + Segment(Info(TimestampScale,
    * Duration), Tracks(TrackEntry(TrackType=1, CodecID, Video(W, H)))).
    * TimestampScale 1e6 ns ⇒ Duration ticks are milliseconds.
    */
  def buildWebm(width: Int, height: Int, durationMs: Long,
      codec: String = "V_VP9"): Array[Byte] = {
    val header = elem(0x1A45DFA3L,
      elem(0x4282L, // DocType
        "webm".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
    val info = elem(Ebml.Info,
      elem(Ebml.TimestampScale, uintBody(1000000L)),
      elem(Ebml.Duration,
        be32(java.lang.Float.floatToIntBits(durationMs.toFloat).toLong)))
    val track = elem(Ebml.TrackEntry,
      elem(Ebml.TrackType, uintBody(1L)),
      elem(Ebml.CodecID,
        codec.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)),
      elem(Ebml.Video,
        elem(Ebml.PixelWidth, uintBody(width.toLong)),
        elem(Ebml.PixelHeight, uintBody(height.toLong))))
    header ++ elem(Ebml.Segment, info, elem(Ebml.Tracks, track))
  }
}
