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

  private def audioOf(ids: Long*) = Containers
    .parseAudioMeta(
      Containers.attachAudioHeaderPayload(ids.map(i => (i, s"d$i")).toDF("doc_id", "text")))
    .collect()
    .map(m => m.doc_id -> m)
    .toMap

  test("FLAC STREAMINFO bit-unpacking recovers rate/channels/bps/duration") {
    val m = audioOf(2L, 4L, 6L)
    assert(m(2L).format === "flac" && m(2L).sample_rate === 44100L)
    assert(m(2L).channels === 2L && m(4L).channels === 1L) // (d%4)/2 alternation
    assert(m(2L).bits_per_sample === 16L)
    assert(m(2L).duration_ms === Containers.flacTotalSamples(2L) * 1000L / 44100L)
    assert(m(2L).bitrate_kbps === 0L)
  }

  test("MP3 frame-sync walk counts frames and reads bitrate/mode") {
    val m = audioOf(1L, 3L, 15L)
    assert(m(1L).format === "mp3" && m(1L).sample_rate === 44100L)
    assert(m(1L).channels === 1L && m(1L).bits_per_sample === 0L)
    assert(m(1L).duration_ms === Containers.mp3FrameCount(1L) * 1152L * 1000L / 44100L)
    // doc 15: bitrate index 1 + 15%14 = 2 → 40 kbps
    assert(m(15L).bitrate_kbps === 40L)
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
