package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Direct (sessionless) tests of the pure-JVM video container parsers:
  * builder→parser round-trips, sample-table resolution, and a
  * truncation fuzz — every prefix of a valid container must parse to
  * None or a value, never throw (one corrupt blob in 100 TB must not
  * fail a job).
  */
class VideoMetaSpec extends AnyFunSuite {

  test("MP4 metadata round-trips through the box walk") {
    val b = VideoMeta.buildMp4(1920, 1080, 123456L, codec = "hvc1")
    val m = VideoMeta.parse(b)
    assert(m.contains(VideoMeta.Meta(1920, 1080, 123456L, "hvc1")))
  }

  test("WebM metadata round-trips through the EBML walk") {
    val b = VideoMeta.buildWebm(854, 480, 60000L, codec = "V_AV1")
    val m = VideoMeta.parse(b)
    assert(m.contains(VideoMeta.Meta(854, 480, 60000L, "V_AV1")))
  }

  test("MP4 sample tables resolve to the exact carried byte ranges") {
    val samples = (0 until 7).map(i => Array.fill[Byte](10 + i)(i.toByte))
    val b = VideoMeta.buildMp4(64, 64, 700L, samples = samples)
    val (offs, sync) = VideoMeta.sampleOffsetsMp4(b)
    assert(offs.length == 7 && sync.isEmpty)
    offs.zipWithIndex.foreach { case ((off, sz), i) =>
      assert(sz == 10 + i)
      val cut = java.util.Arrays.copyOfRange(b, off.toInt, off.toInt + sz)
      assert(java.util.Arrays.equals(cut, samples(i)), s"sample $i")
    }
  }

  test("non-container and truncated bytes never throw") {
    assert(VideoMeta.parse(null).isEmpty)
    assert(VideoMeta.parse("plain text".getBytes("UTF-8")).isEmpty)
    val mp4 = VideoMeta.buildMp4(320, 240, 1000L,
      samples = Seq(Array.fill[Byte](20)(1)))
    val webm = VideoMeta.buildWebm(320, 240, 1000L)
    Seq(mp4, webm).foreach { full =>
      (0 until full.length).foreach { n =>
        val cut = java.util.Arrays.copyOf(full, n)
        VideoMeta.parse(cut) // must not throw
        VideoMeta.sampleOffsetsMp4(cut) // must not throw
      }
    }
    // bit-flip fuzz: deterministic corruptions must not throw either
    (0 until mp4.length).foreach { i =>
      val c = mp4.clone(); c(i) = (c(i) ^ 0x5a).toByte
      VideoMeta.parse(c); VideoMeta.sampleOffsetsMp4(c)
    }
  }
}
