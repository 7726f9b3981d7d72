package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Byte-level container parser laws (multimodal/Containers.scala):
  * planted-field recovery for both container families, malformed
  * dead-lettering, and structural robustness (unknown boxes/elements
  * skipped, truncation detected — never an exception). */
class ContainersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def metaOf(ids: Long*) = Containers
    .parseContainerMeta(
      Containers.attachContainerPayload(ids.map(i => (i, s"d$i")).toDF("doc_id", "text")))
    .collect()
    .map(m => m.doc_id -> m)
    .toMap

  test("MP4 walk recovers every planted field") {
    val m = metaOf(2L, 4L, 10L)
    assert(m(2L).container === "mp4" && m(2L).brand === "isom")
    assert(m(2L).timescale === 600L)
    assert(m(2L).duration_ms === Containers.mp4Duration(2L) * 1000L / 600L)
    assert(m(2L).n_tracks === 1L && m(2L).handlers === "vide")
    assert(m(4L).n_tracks === 2L && m(4L).handlers === "soun,vide")
  }

  test("EBML walk recovers DocType, TimecodeScale, Duration, and track types") {
    val m = metaOf(1L, 3L, 9L)
    assert(m(1L).container === "webm" && m(1L).brand === "webm")
    assert(m(1L).timescale === Containers.WebmTimecodeScale)
    assert(m(1L).duration_ms === Containers.webmDurationMs(1L))
    assert(m(1L).n_tracks === 1L && m(1L).handlers === "vide")
    assert(m(3L).n_tracks === 2L && m(3L).handlers === "soun,vide")
    assert(m(9L).duration_ms === Containers.webmDurationMs(9L))
  }

  test("malformed payloads dead-letter as decode_ok=false, never throw") {
    val bad = Seq(
      (1L, Array[Byte](1, 2, 3)),                      // garbage
      (2L, Containers.renderMp4(2L).take(20)),          // truncated mid-box
      (3L, Containers.renderWebm(3L).take(6)),          // truncated mid-varint
      (4L, Array.empty[Byte]),
      (5L, Containers.renderMp4(10L))                   // valid — control row
    ).toDF("doc_id", "payload")
    val out = Containers.parseContainerMeta(bad).collect().map(m => m.doc_id -> m.decode_ok).toMap
    assert(out === Map(1L -> false, 2L -> false, 3L -> false, 4L -> false, 5L -> true))
  }

  test("EBML size with bit 31 set dead-letters instead of looping") {
    // 2^31 truncates to a negative Int end that passed the old `end > to`
    // check while `off = end` made no progress — this test HANGS on a
    // regression. Size encoded in the writer's 8-byte form (0x01 marker).
    val size31 = Array(0x01, 0x00, 0x00, 0x00, 0x80, 0x00, 0x00, 0x00).map(_.toByte)
    val evil   = Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte) ++ size31
    val out = Containers.parseContainerMeta(Seq((1L, evil)).toDF("doc_id", "payload")).collect()
    assert(out.length === 1 && !out.head.decode_ok, "oversized EBML size accepted")
  }

  test("version-1 mvhd (64-bit times) parses to the same metadata; unknown versions dead-letter") {
    val ids = Seq(2L, 4L, 7L)
    val v1 = Containers
      .parseContainerMeta(ids.map(i => (i, Containers.renderMp4V1(i))).toDF("doc_id", "payload"))
      .collect().map(m => m.doc_id -> m).toMap
    val v0 = Containers
      .parseContainerMeta(ids.map(i => (i, Containers.renderMp4(i))).toDF("doc_id", "payload"))
      .collect().map(m => m.doc_id -> m).toMap
    ids.foreach { i =>
      assert(v1(i).decode_ok, s"v1 mvhd rejected for doc $i")
      assert(v1(i) === v0(i), s"v1 parse diverged from v0 for doc $i")
    }
    // an unsupported mvhd version must dead-letter, not return garbage
    val b = Containers.renderMp4V1(2L)
    val bad = b.clone()
    // locate the mvhd box: ftyp len, then moov hdr (8), then mvhd hdr (8) → version byte
    val ftypLen = ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) | ((b(2) & 0xff) << 8) | (b(3) & 0xff)
    bad(ftypLen + 8 + 8) = 2.toByte
    val out = Containers.parseContainerMeta(Seq((9L, bad)).toDF("doc_id", "payload")).collect()
    assert(!out.head.decode_ok, "unknown mvhd version parsed as garbage")
  }

  test("JPEG marker walk recovers planted dims from real encoder output; progressive + corrupt handled") {
    val ids = Seq(1L, 2L, 37L)
    val out = Containers
      .parseJpegMeta(ids.map(i => (i, Containers.renderJpeg(i))).toDF("doc_id", "payload"))
      .collect().map(m => m.doc_id -> m).toMap
    ids.foreach { i =>
      assert(out(i).decode_ok, s"real JPEG rejected for doc $i")
      assert(out(i).width === Containers.jpegWidth(i) && out(i).height === Containers.jpegHeight(i))
      assert(out(i).n_components === 3L && !out(i).progressive)
    }
    // hand-built progressive frame: SOI + SOF2(len 11: prec, h, w, 1 comp + 3 comp bytes)
    val sof2 = Array(0xff, 0xd8, 0xff, 0xc2, 0x00, 0x0b, 8, 0x01, 0x00, 0x02, 0x00, 1, 1, 0x11, 0)
      .map(_.toByte)
    val p = Containers.parseJpegMeta(Seq((9L, sof2)).toDF("doc_id", "payload")).collect().head
    assert(p.decode_ok && p.progressive && p.width === 512L && p.height === 256L && p.n_components === 1L)
    // ITU T.81 B.1.1.2: 0xFF fill bytes may pad between segments — a
    // spec-legal stream some encoders emit must still parse. Inject a run
    // of fill bytes before the SOF2 marker of the hand-built frame.
    val padded = sof2.take(2) ++ Array.fill(5)(0xff.toByte) ++ sof2.drop(2)
    val pp = Containers.parseJpegMeta(Seq((10L, padded)).toDF("doc_id", "payload")).collect().head
    assert(pp.decode_ok && pp.progressive && pp.width === 512L && pp.height === 256L,
      "0xFF fill bytes between segments dead-lettered a spec-legal stream")
    // corrupt: truncated mid-segment, SOS-before-SOF, garbage — all dead-letter
    val bad = Seq(
      (1L, Containers.renderJpeg(5L).take(6)),
      (2L, Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0, 0).map(_.toByte)),
      (3L, Array[Byte](1, 2, 3)),
      (4L, Array(0xff, 0xd8, 0xff, 0xff, 0xff).map(_.toByte))) // trailing fill, truncated
    val badOut = Containers.parseJpegMeta(bad.toDF("doc_id", "payload")).collect()
    assert(badOut.forall(!_.decode_ok))
  }

  test("fuzz: random bytes through every container/audio walk terminate and never throw") {
    val rnd = new scala.util.Random(97)
    val rows = (1L to 500L).map { i =>
      val len = rnd.nextInt(300)
      val b   = new Array[Byte](len); rnd.nextBytes(b)
      // half the rows get a real magic prefix to force the deep walks
      val payload = (i % 7) match {
        case 0 => "ftypisom".getBytes("US-ASCII").patch(0, Array[Byte](0, 0, 0, 32), 0) ++ b
        case 1 => Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte) ++ b
        case 2 => "fLaC".getBytes("US-ASCII") ++ b
        case 3 => Array(0xff, 0xfb).map(_.toByte) ++ b
        case 4 => Array(0xff, 0xd8).map(_.toByte) ++ b // JPEG SOI + garbage
        case 5 => "RIFFxxxxWAVE".getBytes("US-ASCII") ++ b
        case _ => b
      }
      (i, payload)
    }
    val containers = Containers.parseContainerMeta(rows.toDF("doc_id", "payload")).collect()
    assert(containers.length === 500) // one row in, one row out — ok or dead-letter
    val audio = Containers.parseAudioMeta(rows.toDF("doc_id", "payload")).collect()
    assert(audio.length === 500)
    val jpeg = Containers.parseJpegMeta(rows.toDF("doc_id", "payload")).collect()
    assert(jpeg.length === 500)
  }

  private def audioOf(ids: Long*) = Containers
    .parseAudioMeta(
      Containers.attachAudioHeaderPayload(ids.map(i => (i, s"d$i")).toDF("doc_id", "text")))
    .collect()
    .map(m => m.doc_id -> m)
    .toMap

  test("FLAC STREAMINFO bit-unpacking recovers rate/channels/bps/duration") {
    val m = audioOf(6L, 12L, 18L) // ids ≡ 0 (mod 3) render FLAC
    assert(m(6L).format === "flac" && m(6L).sample_rate === 44100L)
    assert(m(6L).channels === 2L && m(12L).channels === 1L) // (d%4)/2 alternation
    assert(m(6L).bits_per_sample === 16L)
    assert(m(6L).duration_ms === Containers.flacTotalSamples(6L) * 1000L / 44100L)
    assert(m(6L).bitrate_kbps === 0L)
  }

  test("MP3 frame-sync walk counts frames and reads bitrate/mode") {
    val m = audioOf(1L, 7L, 43L) // ids ≡ 1 (mod 3) render MP3
    assert(m(1L).format === "mp3" && m(1L).sample_rate === 44100L)
    assert(m(1L).channels === 1L && m(1L).bits_per_sample === 0L)
    assert(m(1L).duration_ms === Containers.mp3FrameCount(1L) * 1152L * 1000L / 44100L)
    // doc 43: bitrate index 1 + 43%14 = 2 → 40 kbps
    assert(m(43L).bitrate_kbps === 40L)
  }

  test("WAV RIFF chunk walk recovers fmt/data fields; corrupt chunks dead-letter") {
    val m = audioOf(2L, 5L) // ids ≡ 2 (mod 3) render WAV
    assert(m(2L).format === "wav" && m(2L).sample_rate === 22050L)
    assert(m(2L).channels === 1L && m(5L).channels === 2L) // (d%6)/3 alternation
    assert(m(2L).bits_per_sample === 16L && m(2L).bitrate_kbps === 0L)
    assert(m(2L).duration_ms === Containers.wavFrames(2L) * 1000L / 22050L)
    // corrupt: truncated fmt, non-PCM, missing data chunk — all dead-letter
    val good = Containers.renderWav(2L)
    val nonPcm = good.clone(); nonPcm(20) = 3 // wFormatTag -> IEEE float
    val noData = good.take(36)                // RIFF+fmt only, no data header
    val out = Containers.parseAudioMeta(Seq(
      (1L, good.take(14)), (2L, nonPcm), (3L, noData)).toDF("doc_id", "payload"))
      .collect().map(r => r.doc_id -> r.decode_ok).toMap
    assert(out === Map(1L -> false, 2L -> false, 3L -> false))
  }

  test("FLAC bit-unpacking survives random rates/channels/bps (hand-built STREAMINFO)") {
    // build STREAMINFO directly so the fields exercise the full bit
    // widths, not just the writer's fixed 44100/16 choices
    def flac(rate: Long, chans: Long, bps: Long, total: Long): Array[Byte] = {
      val body   = new Array[Byte](34)
      val packed = (rate << 44) | ((chans - 1) << 41) | ((bps - 1) << 36) | total
      (0 until 8).foreach(i => body(10 + i) = ((packed >> (8 * (7 - i))) & 0xff).toByte)
      "fLaC".getBytes("US-ASCII") ++
        Array(0x80.toByte, 0.toByte, 0.toByte, 34.toByte) ++ body
    }
    val rnd = new scala.util.Random(31337)
    (0 until 25).foreach { _ =>
      val rate  = 1L + rnd.nextInt(0xfffff)        // full 20-bit range
      val chans = 1L + rnd.nextInt(8)              // 3-bit field
      val bps   = 4L + rnd.nextInt(29)             // 5-bit field
      val total = math.abs(rnd.nextLong()) & 0xfffffffffL // 36 bits
      val out = Containers
        .parseAudioMeta(Seq((1L, flac(rate, chans, bps, total))).toDF("doc_id", "payload"))
        .collect().head
      assert(out.decode_ok, s"($rate,$chans,$bps,$total) failed to parse")
      assert(out.sample_rate === rate && out.channels === chans && out.bits_per_sample === bps)
      assert(out.duration_ms === total * 1000L / rate)
    }
  }

  test("MP3 walk honors the padding bit (frame length +1)") {
    // two frames, both padded: header bytes 0xFF 0xFB, bitrate idx 9
    // (128 kbps @ 44100 → 417-byte unpadded frames), pad bit set
    val frameLen = (144L * 128000L / 44100L).toInt + 1
    val out = new Array[Byte](frameLen * 2)
    Seq(0, frameLen).foreach { off =>
      out(off) = 0xff.toByte; out(off + 1) = 0xfb.toByte
      out(off + 2) = ((9 << 4) | (0 << 2) | (1 << 1)).toByte // idx 9, 44100, padded
      out(off + 3) = 0xc0.toByte
    }
    val m = Containers
      .parseAudioMeta(Seq((1L, out)).toDF("doc_id", "payload"))
      .collect().head
    assert(m.decode_ok, "padded frames lost sync")
    assert(m.duration_ms === 2L * 1152L * 1000L / 44100L, s"frame count wrong: $m")
    assert(m.bitrate_kbps === 128L)
  }

  test("audio parse dead-letters malformed payloads") {
    val bad = Seq(
      (1L, Containers.renderFlac(2L).take(10)),  // truncated STREAMINFO
      (2L, Containers.renderMp3(1L).take(2)),    // sync byte, then nothing
      (3L, Array[Byte](0, 1, 2, 3)),
      (4L, Containers.renderMp3(7L))             // valid control row
    ).toDF("doc_id", "payload")
    val out = Containers.parseAudioMeta(bad).collect().map(m => m.doc_id -> m.decode_ok).toMap
    assert(out === Map(1L -> false, 2L -> false, 3L -> false, 4L -> true))
  }

  test("MP4 size escapes: 64-bit largesize boxes are skipped; size=0 extends to EOF") {
    val base = Containers.renderMp4(8L)
    def u32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    // splice an mdat using the 64-bit largesize form (size field = 1)
    val payload  = Array.fill[Byte](32)(7)
    val largeBox = u32(1L) ++ "mdat".getBytes("US-ASCII") ++
      u32(0L) ++ u32(16L + payload.length) ++ payload
    val ftypLen = 16
    val spliced = base.take(ftypLen) ++ largeBox ++ base.drop(ftypLen)
    val out = Containers
      .parseContainerMeta(Seq((8L, spliced)).toDF("doc_id", "payload"))
      .collect().head
    assert(out.decode_ok, "largesize mdat killed the metadata walk")
    assert(out.duration_ms === Containers.mp4Duration(8L) * 1000L / 600L)
    assert(out.n_tracks === 2L) // doc 8 ≡ 0 mod 4 → video + audio
    // size=0 final box (extends to EOF) parses too
    val eofBox  = u32(0L) ++ "free".getBytes("US-ASCII") ++ Array.fill[Byte](10)(3)
    val withEof = base ++ eofBox
    val out2 = Containers
      .parseContainerMeta(Seq((8L, withEof)).toDF("doc_id", "payload"))
      .collect().head
    assert(out2.decode_ok && out2.n_tracks === 2L, "size-0 trailing box broke the walk")
  }

  test("EBML general varints of every width parse back to the planted Duration") {
    // the writer emits fixed 8-byte sizes; a real mux uses minimal-width
    // varints — hand-build headers with every size width 1..8 and check
    // the general parser recovers the same planted fields
    def sizeVarint(n: Long, width: Int): Array[Byte] = {
      val marker = 1L << (8 - width) // leading-byte marker bit
      val total  = (marker << (8 * (width - 1))) | n
      ((width - 1) to 0 by -1).map(i => ((total >> (8 * i)) & 0xff).toByte).toArray
    }
    def el(id: Array[Byte], width: Int, body: Array[Byte]): Array[Byte] =
      id ++ sizeVarint(body.length.toLong, width) ++ body
    def f64(v: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(v)
      (7 to 0 by -1).map(i => ((bits >> (8 * i)) & 0xff).toByte).toArray
    }
    (1 to 8).foreach { w =>
      val payload =
        el(Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte), w,
          el(Array(0x42, 0x82).map(_.toByte), w, "webm".getBytes("US-ASCII"))) ++
        el(Array(0x18, 0x53, 0x80, 0x67).map(_.toByte), w,
          el(Array(0x15, 0x49, 0xa9, 0x66).map(_.toByte), w,
            el(Array(0x2a, 0xd7, 0xb1).map(_.toByte), w, Array(0x0f.toByte, 0x42.toByte, 0x40.toByte)) ++
            el(Array(0x44, 0x89).map(_.toByte), w, f64(1234.0))))
      val out = Containers
        .parseContainerMeta(Seq((7L, payload)).toDF("doc_id", "payload"))
        .collect().head
      assert(out.decode_ok, s"width-$w varint failed to parse")
      assert(out.brand === "webm" && out.duration_ms === 1234L && out.timescale === 1000000L,
        s"width-$w varint mis-parsed: $out")
    }
  }

  test("unknown boxes and EBML elements are skipped, not fatal") {
    // splice an unknown 'free' box between ftyp and moov
    val base  = Containers.renderMp4(6L)
    val ftypLen = 16
    val free  = Array[Byte](0, 0, 0, 12) ++ "free".getBytes("US-ASCII") ++ Array[Byte](9, 9, 9, 9)
    val mixed = base.take(ftypLen) ++ free ++ base.drop(ftypLen)
    val out = Containers
      .parseContainerMeta(Seq((6L, mixed)).toDF("doc_id", "payload"))
      .collect().head
    assert(out.decode_ok && out.duration_ms === Containers.mp4Duration(6L) * 1000L / 600L)
  }
}
