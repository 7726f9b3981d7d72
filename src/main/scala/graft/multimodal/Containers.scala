package graft.multimodal

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Container-level media metadata (SURVEY.md §2.D D8): parse MP4 (ISO
  * BMFF box tree) and EBML/Matroska-WebM headers with PURE BYTE
  * ARITHMETIC — no codec, no external library — the way every media
  * catalog stats 100 TB of video without decoding a single frame.
  * Duration/track metadata lives in a few hundred header bytes; a scan
  * that reads only those bytes is I/O-bound on metadata, not video.
  *
  * Writers ([[renderMp4]], [[renderWebm]]) plant structurally-valid
  * fixtures whose every field is modular arithmetic of the doc id, so
  * the registered query `d8_video_meta` is exactly reproducible by the
  * DuckDB oracle — the parse path itself is what the hash check
  * exercises (same trick as d8_image_decode's PNG sums).
  *
  * Scale shape: parsing is a shuffle-free `mapPartitions` over the
  * payload column; malformed payloads surface as `decode_ok = false`
  * rows (dead-letter column, never an executor exception) — the A8
  * malformed-tolerance contract extended to binary media.
  */
object Containers {

  final case class ContainerMeta(
      doc_id: Long,
      decode_ok: Boolean,
      container: String, // "mp4" | "webm" | "unknown"
      brand: String,     // ftyp major brand / EBML DocType
      timescale: Long,   // mvhd timescale / EBML TimecodeScale (ns)
      duration_ms: Long,
      n_tracks: Long,
      handlers: String)  // sorted comma-joined track handler 4ccs

  // --- byte helpers -----------------------------------------------------

  private def u16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def u32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  // --- MP4 (ISO BMFF) ---------------------------------------------------

  private def mp4Box(tp: String, parts: Array[Byte]*): Array[Byte] = {
    val body = parts.flatMap(_.toSeq).toArray
    u32(body.length + 8L) ++ tp.getBytes("US-ASCII") ++ body
  }

  /** Movie duration in mvhd units (timescale 600) for doc `d` — the
    * planted ground truth the oracle recomputes. */
  def mp4Duration(d: Long): Long = 600L + (d * 37L) % 120000L
  val Mp4Timescale = 600L

  /** Minimal structurally-valid metadata-only MP4: ftyp + moov(mvhd,
    * trak(tkhd, mdia(mdhd, hdlr))×n). No mdat — a catalog scan never
    * needs samples. Even doc%4==0 gets a second (audio) track. */
  def renderMp4(d: Long): Array[Byte] = {
    def fullBoxBody(tail: Array[Byte]): Array[Byte] = u32(0L) ++ tail // version+flags then payload
    val mvhd = mp4Box("mvhd", fullBoxBody(
      u32(0L) ++ u32(0L) ++                       // ctime, mtime
        u32(Mp4Timescale) ++ u32(mp4Duration(d)) ++
        new Array[Byte](80)))                     // rate..next_track_id: zeros
    def trak(trackId: Long, handler: String, mdTs: Long, mdDur: Long): Array[Byte] = {
      val tkhd = mp4Box("tkhd", fullBoxBody(
        u32(0L) ++ u32(0L) ++ u32(trackId) ++ u32(0L) ++ u32(0L) ++
          new Array[Byte](8) ++ u16(0) ++ u16(0) ++ u16(0) ++ u16(0) ++
          new Array[Byte](36) ++                  // matrix
          u32(320L << 16) ++ u32(240L << 16)))    // 16.16 fixed dims
      val mdhd = mp4Box("mdhd", fullBoxBody(
        u32(0L) ++ u32(0L) ++ u32(mdTs) ++ u32(mdDur) ++ u16(0x55c4) ++ u16(0)))
      val hdlr = mp4Box("hdlr", fullBoxBody(
        u32(0L) ++ handler.getBytes("US-ASCII") ++ new Array[Byte](12) ++ Array(0.toByte)))
      mp4Box("trak", tkhd, mp4Box("mdia", mdhd, hdlr))
    }
    val tracks = mutable.ArrayBuffer(trak(1L, "vide", 90000L, (d * 11L) % 500000L))
    if (d % 4 == 0) tracks += trak(2L, "soun", 48000L, (d * 13L) % 800000L)
    val ftyp = mp4Box("ftyp", "isom".getBytes("US-ASCII"), u32(0x200L))
    ftyp ++ mp4Box("moov", (mvhd +: tracks.toSeq): _*)
  }

  /** Version-1 mvhd variant of [[renderMp4]] — 64-bit ctime/mtime/duration,
    * the layout most real encoders emit for long/recent files. Same planted
    * values as the version-0 render, so both parse to identical metadata. */
  def renderMp4V1(d: Long): Array[Byte] = {
    def u64(v: Long): Array[Byte] = u32(v >>> 32) ++ u32(v & 0xffffffffL)
    val mvhd = mp4Box("mvhd",
      Array(1.toByte, 0.toByte, 0.toByte, 0.toByte) ++ // version 1, flags 0
        u64(0L) ++ u64(0L) ++                          // ctime, mtime (64-bit)
        u32(Mp4Timescale) ++ u64(mp4Duration(d)) ++    // timescale, 64-bit duration
        new Array[Byte](80))
    val v0 = renderMp4(d)
    // splice: reuse renderMp4's ftyp + traks, swap in the v1 mvhd
    val ftypLen = be32(v0, 0).toInt
    val moovOff = ftypLen
    val mvhdLen = be32(v0, moovOff + 8).toInt
    val rest    = java.util.Arrays.copyOfRange(v0, moovOff + 8 + mvhdLen, v0.length)
    val moovBody = mvhd ++ rest
    java.util.Arrays.copyOfRange(v0, 0, ftypLen) ++
      u32(moovBody.length + 8L) ++ "moov".getBytes("US-ASCII") ++ moovBody
  }

  private val Mp4Containers = Set("moov", "trak", "mdia")

  private def parseMp4(d: Long, b: Array[Byte]): ContainerMeta = {
    var brand = ""
    var ts = 0L
    var dur = 0L
    val handlers = mutable.ArrayBuffer.empty[String]
    var nTracks = 0L
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val size32 = be32(b, off)
        val tp     = fourcc(b, off + 4)
        // ISO BMFF size escapes every real file uses: size==1 → 64-bit
        // largesize follows the type (the >4 GB mdat case — a metadata
        // walk must SKIP it, not choke on it); size==0 → box extends to
        // the end of the enclosing scope (legal only for the last box).
        val (size, hdr): (Long, Int) =
          if (size32 == 1L) {
            if (off + 16 > to) throw new IllegalArgumentException("truncated largesize")
            val hi = be32(b, off + 8); val lo = be32(b, off + 12)
            ((hi << 32) | lo, 16)
          } else if (size32 == 0L) ((to - off).toLong, 8)
          else (size32, 8)
        if (size < hdr || off + size > to) throw new IllegalArgumentException("bad box size")
        val end = (off + size).toInt
        tp match {
          case "ftyp" => brand = fourcc(b, off + hdr)
          case "mvhd" =>
            // full-box, layout depends on the version byte — real files
            // commonly use version 1 (64-bit ctime/mtime/duration), and
            // reading it with version-0 offsets returns decode_ok=true
            // with garbage timescale/duration. Dispatch; unknown versions
            // dead-letter.
            (b(off + hdr) & 0xff) match {
              case 0 => // ver/flags(4) ctime(4) mtime(4) timescale(4) duration(4)
                ts = be32(b, off + hdr + 12); dur = be32(b, off + hdr + 16)
              case 1 => // ver/flags(4) ctime(8) mtime(8) timescale(4) duration(8)
                ts = be32(b, off + hdr + 20)
                dur = (be32(b, off + hdr + 24) << 32) | be32(b, off + hdr + 28)
              case v => throw new IllegalArgumentException(s"unsupported mvhd version $v")
            }
          case "trak" => nTracks += 1; walk(off + hdr, end)
          case "hdlr" => handlers += fourcc(b, off + hdr + 8) // ver/flags(4) predef(4) then handler
          case t if Mp4Containers(t) => walk(off + hdr, end)
          case _ => ()
        }
        off = end
      }
    }
    walk(0, b.length)
    if (ts <= 0) throw new IllegalArgumentException("no mvhd")
    ContainerMeta(d, decode_ok = true, "mp4", brand, ts, dur * 1000L / ts,
      nTracks, handlers.sorted.mkString(","))
  }

  // --- EBML / Matroska-WebM --------------------------------------------

  private val IdEbml = Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte)
  private val IdDocType = Array(0x42, 0x82).map(_.toByte)
  private val IdSegment = Array(0x18, 0x53, 0x80, 0x67).map(_.toByte)
  private val IdInfo = Array(0x15, 0x49, 0xa9, 0x66).map(_.toByte)
  private val IdTimecodeScale = Array(0x2a, 0xd7, 0xb1).map(_.toByte)
  private val IdDuration = Array(0x44, 0x89).map(_.toByte)
  private val IdTracks = Array(0x16, 0x54, 0xae, 0x6b).map(_.toByte)
  private val IdTrackEntry = Array(0xae).map(_.toByte)
  private val IdTrackType = Array(0x83).map(_.toByte)

  /** EBML data-size varint, fixed 8-byte form (0x01 marker + 7 value
    * bytes) — legal for any size and keeps the writer trivial; the
    * parser below handles the general 1-8 byte form. */
  private def ebmlSize(n: Long): Array[Byte] =
    Array(0x01.toByte) ++ (6 to 0 by -1).map(i => ((n >> (8 * i)) & 0xff).toByte)

  private def el(id: Array[Byte], body: Array[Byte]*): Array[Byte] = {
    val b = body.flatMap(_.toSeq).toArray
    id ++ ebmlSize(b.length.toLong) ++ b
  }

  private def ebmlUint(v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && (v >> (8 * n)) != 0) n += 1
    ((n - 1) to 0 by -1).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
  }

  private def ebmlFloat64(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    (7 to 0 by -1).map(i => ((bits >> (8 * i)) & 0xff).toByte).toArray
  }

  /** Planted WebM duration in ms for doc `d`. */
  def webmDurationMs(d: Long): Long = (d * 53L) % 3600000L
  val WebmTimecodeScale = 1000000L // ns per timecode unit → timecodes are ms

  /** Minimal WebM header: EBML(DocType=webm) + Segment(Info(TimecodeScale,
    * Duration), Tracks(TrackEntry(TrackType)×n)). Odd doc%3==0 gets a
    * second (audio, TrackType=2) track. */
  def renderWebm(d: Long): Array[Byte] = {
    val header = el(IdEbml, el(IdDocType, "webm".getBytes("US-ASCII")))
    val info = el(IdInfo,
      el(IdTimecodeScale, ebmlUint(WebmTimecodeScale)),
      el(IdDuration, ebmlFloat64(webmDurationMs(d).toDouble)))
    val entries = mutable.ArrayBuffer(el(IdTrackEntry, el(IdTrackType, ebmlUint(1L))))
    if (d % 3 == 0) entries += el(IdTrackEntry, el(IdTrackType, ebmlUint(2L)))
    header ++ el(IdSegment, info, el(IdTracks, entries.toSeq: _*))
  }

  /** General EBML varint at `off`: (value, width). `keepMarker` for
    * element IDs (IDs are compared marker-inclusive), cleared for sizes. */
  private def ebmlVarint(b: Array[Byte], off: Int, keepMarker: Boolean): (Long, Int) = {
    val first = b(off) & 0xff
    if (first == 0) throw new IllegalArgumentException("invalid EBML varint")
    val width = Integer.numberOfLeadingZeros(first) - 23 // leading zeros within 8 bits + 1
    var v = if (keepMarker) first.toLong else (first & ((1 << (8 - width)) - 1)).toLong
    (1 until width).foreach(i => v = (v << 8) | (b(off + i) & 0xffL))
    (v, width)
  }

  private def parseWebm(d: Long, b: Array[Byte]): ContainerMeta = {
    var docType = ""
    var tcScale = 1000000L // Matroska default
    var durUnits = 0.0
    var nTracks = 0L
    val handlers = mutable.ArrayBuffer.empty[String]

    def walk(from: Int, to: Int, depth: Int): Unit = {
      var off = from
      while (off < to) {
        val (id, idW)    = ebmlVarint(b, off, keepMarker = true)
        val (size, szW)  = ebmlVarint(b, off + idW, keepMarker = false)
        val body         = off + idW + szW
        // bound-check in LONG arithmetic BEFORE truncating: an EBML size
        // with bit 31 set would truncate to a negative/backward end that
        // passes `end > to`, and `off = end` would then loop without
        // progress — malformed payloads must dead-letter, never spin
        // (parseMp4's `size < hdr` check is the equivalent guard there).
        val endL         = body.toLong + size
        if (size < 0L || endL > to) throw new IllegalArgumentException("bad EBML size")
        val end          = endL.toInt // body > off always (idW, szW >= 1) → progress
        id match {
          case 0x1a45dfa3L | 0x18538067L | 0x1549a966L | 0x1654ae6bL =>
            walk(body, end, depth + 1)
          case 0xaeL => // TrackEntry
            nTracks += 1; walk(body, end, depth + 1)
          case 0x4282L => docType = new String(b, body, size.toInt, "US-ASCII")
          case 0x2ad7b1L =>
            tcScale = (0 until size.toInt).foldLeft(0L)((a, i) => (a << 8) | (b(body + i) & 0xffL))
          case 0x4489L =>
            val bits = (0 until size.toInt).foldLeft(0L)((a, i) => (a << 8) | (b(body + i) & 0xffL))
            durUnits =
              if (size == 4) java.lang.Float.intBitsToFloat(bits.toInt).toDouble
              else java.lang.Double.longBitsToDouble(bits)
          case 0x83L => // TrackType: 1=video, 2=audio — normalized to 4ccs
            val t = (0 until size.toInt).foldLeft(0L)((a, i) => (a << 8) | (b(body + i) & 0xffL))
            handlers += (if (t == 1L) "vide" else if (t == 2L) "soun" else s"trk$t")
          case _ => ()
        }
        off = end
      }
    }
    walk(0, b.length, 0)
    if (docType.isEmpty) throw new IllegalArgumentException("no DocType")
    // duration_ms = durUnits timecodes × tcScale ns / 1e6
    val ms = math.round(durUnits * tcScale / 1000000.0)
    ContainerMeta(d, decode_ok = true, "webm", docType, tcScale, ms,
      nTracks, handlers.sorted.mkString(","))
  }

  // --- FLAC / MP3 audio headers ----------------------------------------

  final case class AudioMeta(
      doc_id: Long,
      decode_ok: Boolean,
      format: String,    // "flac" | "mp3" | "unknown"
      sample_rate: Long,
      channels: Long,
      bits_per_sample: Long, // 0 for mp3 (not a header field there)
      duration_ms: Long,
      bitrate_kbps: Long)    // 0 for flac (lossless, no header bitrate)

  /** Planted FLAC total samples for doc `d` (sample rate fixed 44100). */
  def flacTotalSamples(d: Long): Long = 44100L + (d * 97L) % 4410000L

  /** Minimal FLAC: "fLaC" magic + one last-flagged STREAMINFO block —
    * the 34-byte bit-packed struct every FLAC file leads with
    * (min/max block size, min/max frame size, 20-bit sample rate,
    * 3-bit channels-1, 5-bit bps-1, 36-bit total samples, MD5). */
  def renderFlac(d: Long): Array[Byte] = {
    val sampleRate = 44100L
    val channels   = 1L + (d % 4) / 2 // even docs alternate mono/stereo
    val bps        = 16L
    val total      = flacTotalSamples(d)
    val body = new Array[Byte](34)
    // min/max block size (u16 each), min/max frame size (u24 each)
    body(0) = 0x10; body(1) = 0; body(2) = 0x10; body(3) = 0
    // bytes 10..17 pack: rate(20) | chan-1(3) | bps-1(5) | total(36)
    val packed = (sampleRate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | total
    (0 until 8).foreach(i => body(10 + i) = ((packed >> (8 * (7 - i))) & 0xff).toByte)
    "fLaC".getBytes("US-ASCII") ++
      Array((0x80).toByte, 0.toByte, 0.toByte, 34.toByte) ++ // last-block flag | type 0, u24 len
      body
  }

  private def parseFlac(d: Long, b: Array[Byte]): AudioMeta = {
    var off = 4
    var found: AudioMeta = null
    var last = false
    while (!last && found == null) {
      val hdr  = b(off) & 0xff
      last = (hdr & 0x80) != 0
      val tp   = hdr & 0x7f
      val len  = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
      if (tp == 0) {
        if (len < 34) throw new IllegalArgumentException("short STREAMINFO")
        val base = off + 4
        var packed = 0L
        (0 until 8).foreach(i => packed = (packed << 8) | (b(base + 10 + i) & 0xffL))
        val rate  = (packed >>> 44) & 0xfffffL
        val chans = ((packed >>> 41) & 0x7L) + 1
        val bps   = ((packed >>> 36) & 0x1fL) + 1
        val total = packed & 0xfffffffffL
        if (rate == 0) throw new IllegalArgumentException("zero sample rate")
        found = AudioMeta(d, decode_ok = true, "flac", rate, chans, bps,
          total * 1000L / rate, 0L)
      }
      off += 4 + len
      if (off > b.length) throw new IllegalArgumentException("bad block length")
    }
    if (found == null) throw new IllegalArgumentException("no STREAMINFO")
    found
  }

  // MPEG-1 Layer III tables (the public header spec)
  private val Mp3Bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Rates    = Array(44100L, 48000L, 32000L, 0L)

  /** Planted MP3 frame count for doc `d`. */
  def mp3FrameCount(d: Long): Long = 10L + (d * 13L) % 990L
  /** Planted MP3 bitrate index for doc `d` (1..14 → 32..320 kbps). */
  def mp3BitrateIndex(d: Long): Int = 1 + (d % 14L).toInt

  /** Minimal MPEG-1 Layer III stream: `n` consecutive frames with valid
    * sync headers (0xFFFB…) and spec-sized zero payloads — frame size =
    * 144 × bitrate / rate (+padding 0). CBR duration = frames × 1152
    * samples. */
  def renderMp3(d: Long): Array[Byte] = {
    val bi     = mp3BitrateIndex(d)
    val rate   = 44100L
    val frames = mp3FrameCount(d)
    val frameLen = (144L * Mp3Bitrates(bi) * 1000L / rate).toInt
    val out = new Array[Byte](frameLen * frames.toInt)
    var off = 0
    (0L until frames).foreach { _ =>
      out(off) = 0xff.toByte
      out(off + 1) = 0xfb.toByte                      // MPEG-1, layer III, no CRC
      out(off + 2) = ((bi << 4) | 0x00).toByte        // bitrate idx, rate idx 0 (44100), no pad
      out(off + 3) = 0xc0.toByte                      // mono
      off += frameLen
    }
    out
  }

  private def parseMp3(d: Long, b: Array[Byte]): AudioMeta = {
    var off = 0
    var frames = 0L
    var rate = 0L
    var bitrate = 0L
    var channels = 0L
    while (off + 4 <= b.length) {
      if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xe0) != 0xe0)
        throw new IllegalArgumentException("lost sync")
      val version = (b(off + 1) >> 3) & 0x3
      val layer   = (b(off + 1) >> 1) & 0x3
      if (version != 3 || layer != 1) throw new IllegalArgumentException("not MPEG-1 layer III")
      val bi  = (b(off + 2) >> 4) & 0xf
      val ri  = (b(off + 2) >> 2) & 0x3
      val pad = (b(off + 2) >> 1) & 0x1
      if (bi == 0 || bi == 15 || ri == 3) throw new IllegalArgumentException("bad header")
      rate = Mp3Rates(ri)
      bitrate = Mp3Bitrates(bi).toLong
      channels = if (((b(off + 3) >> 6) & 0x3) == 3) 1L else 2L
      frames += 1
      off += (144L * bitrate * 1000L / rate).toInt + pad
    }
    if (frames == 0) throw new IllegalArgumentException("no frames")
    // MPEG-1 layer III: 1152 samples per frame
    AudioMeta(d, decode_ok = true, "mp3", rate, channels, 0L,
      frames * 1152L * 1000L / rate, bitrate)
  }

  /** Planted WAV frame (sample) count for doc `d` (rate fixed 22050). */
  def wavFrames(d: Long): Long = 22050L + (d * 71L) % 2205000L

  /** Minimal canonical WAV: RIFF/WAVE + PCM fmt chunk (channels, rate,
    * bits) + a data chunk header whose SIZE carries the planted frame
    * count — a header walk never reads the samples, so the chunk body is
    * omitted exactly like the MP4 fixtures omit mdat. */
  def renderWav(d: Long): Array[Byte] = {
    def le16(v: Int): Array[Byte]  = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val rate     = 22050L
    val channels = 1 + (d % 6).toInt / 3 // thirds alternate mono/stereo
    val bits     = 16
    val block    = channels * bits / 8
    val dataLen  = wavFrames(d) * block
    val fmt = le16(1) ++ le16(channels) ++ le32(rate) ++
      le32(rate * block) ++ le16(block) ++ le16(bits)
    "RIFF".getBytes("US-ASCII") ++ le32(4 + 24 + 8 + dataLen) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16L) ++ fmt ++
      "data".getBytes("US-ASCII") ++ le32(dataLen)
  }

  private def parseWav(d: Long, b: Array[Byte]): AudioMeta = {
    def le16(off: Int): Int  = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    def le32(off: Int): Long = (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    if (b.length < 12 || fourcc(b, 8) != "WAVE") throw new IllegalArgumentException("not WAVE")
    var off = 12
    var rate = 0L; var channels = 0L; var bits = 0L; var block = 0L; var dataLen = -1L
    // chunk walk: fmt must precede data (canonical order); sizes validated
    // in Long arithmetic with forward progress (the EBML/KPL discipline)
    while (off + 8 <= b.length && dataLen < 0) {
      val id  = fourcc(b, off)
      val len = le32(off + 4)
      if (len < 0) throw new IllegalArgumentException("bad chunk length")
      id match {
        case "fmt " =>
          if (len < 16 || off + 8 + 16 > b.length) throw new IllegalArgumentException("short fmt")
          if (le16(off + 8) != 1) throw new IllegalArgumentException("not PCM")
          channels = le16(off + 10).toLong
          rate     = le32(off + 12)
          block    = le16(off + 20).toLong
          bits     = le16(off + 22).toLong
        case "data" =>
          // the header walk stops HERE: the sample body is never read
          // (fixtures omit it; real files would follow with len bytes)
          dataLen = len
        case _ => ()
      }
      if (id != "data") {
        val next = off.toLong + 8L + len + (len & 1L) // RIFF chunks pad to even
        if (next <= off || next > b.length) throw new IllegalArgumentException("bad chunk bounds")
        off = next.toInt
      }
    }
    if (rate == 0 || block == 0 || dataLen < 0)
      throw new IllegalArgumentException("missing fmt/data")
    AudioMeta(d, decode_ok = true, "wav", rate, channels, bits,
      dataLen / block * 1000L / rate, 0L)
  }

  /** Attach a planted audio payload per doc: ids cycle FLAC → MP3 → WAV
    * (three header families through one parse surface). */
  def attachAudioHeaderPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs // byte-arithmetic render is trivial per row — rebalance not worth its shuffle
      .select(col("doc_id").cast("long"))
      .as[Long]
      .mapPartitions(_.map(d => (d, (d % 3) match {
        case 0 => renderFlac(d)
        case 1 => renderMp3(d)
        case _ => renderWav(d)
      })))
      .toDF("doc_id", "payload")
  }

  /** Parse audio container/frame headers — magic-dispatched, malformed
    * rows dead-letter. Same shuffle-free header-bytes-only scan shape as
    * [[parseContainerMeta]]. */
  def parseAudioMeta(df: DataFrame): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (d, b) =>
        try {
          if (b.length >= 8 && fourcc(b, 0) == "fLaC") parseFlac(d, b)
          else if (b.length >= 12 && fourcc(b, 0) == "RIFF") parseWav(d, b)
          else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0) parseMp3(d, b)
          else AudioMeta(d, decode_ok = false, "unknown", 0L, 0L, 0L, 0L, 0L)
        } catch {
          case _: RuntimeException =>
            AudioMeta(d, decode_ok = false, "unknown", 0L, 0L, 0L, 0L, 0L)
        }
      })
  }

  // --- JPEG (marker walk) ----------------------------------------------

  final case class JpegMeta(
      doc_id: Long,
      decode_ok: Boolean,
      width: Long,
      height: Long,
      n_components: Long,
      progressive: Boolean)

  /** Planted JPEG dimensions for doc `d` — the ground truth the oracle
    * recomputes (the ENCODER's bytes are irrelevant; the parse recovers
    * exactly these from the SOF segment). */
  def jpegWidth(d: Long): Long  = 16L + (d * 7L) % 120L
  def jpegHeight(d: Long): Long = 16L + (d * 11L) % 90L

  /** REAL baseline JPEG bytes (javax.imageio writer) of a planted-size
    * image — the parse target is a genuine encoder's marker stream
    * (JFIF APP0, quant/huffman tables, SOF0), not a hand-built fixture. */
  def renderJpeg(d: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      jpegWidth(d).toInt, jpegHeight(d).toInt, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    // deterministic content (doesn't matter for the header walk)
    img.setRGB(0, 0, (d * 2654435761L).toInt)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** JPEG MARKER WALK: scan FFxx segments to the first SOF (start of
    * frame), read precision/height/width/components from its fixed
    * layout, classify baseline (SOF0/1) vs progressive (SOF2). Stops
    * before entropy-coded data (SOS) — a catalog stats image dimensions
    * from ~1 KB of header, never the scan data. Same Long-validated
    * progress discipline as the MP4/EBML walks. */
  private def parseJpeg(d: Long, b: Array[Byte]): JpegMeta = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      throw new IllegalArgumentException("no SOI")
    var off = 2
    while (off + 4 <= b.length) {
      if ((b(off) & 0xff) != 0xff) throw new IllegalArgumentException("lost marker sync")
      // ITU T.81 B.1.1.2: markers may be preceded by any number of 0xFF
      // fill bytes — skip the run so padded streams don't read a bogus
      // marker/length pair.
      while (off + 4 <= b.length && (b(off + 1) & 0xff) == 0xff) off += 1
      if (off + 4 > b.length) throw new IllegalArgumentException("truncated after fill bytes")
      val marker = b(off + 1) & 0xff
      marker match {
        case 0xd8 | 0x01 => off += 2 // SOI / TEM: no payload
        case m if m >= 0xd0 && m <= 0xd7 => off += 2 // RSTn: no payload
        case 0xd9 => throw new IllegalArgumentException("EOI before SOF")
        case 0xda => throw new IllegalArgumentException("SOS before SOF")
        case m =>
          val len = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
          if (len < 2 || off + 2 + len > b.length)
            throw new IllegalArgumentException("bad segment length")
          if ((m >= 0xc0 && m <= 0xc3) || (m >= 0xc5 && m <= 0xc7) ||
              (m >= 0xc9 && m <= 0xcb) || (m >= 0xcd && m <= 0xcf)) {
            // SOF: precision(1) height(2) width(2) ncomp(1)
            if (len < 8) throw new IllegalArgumentException("short SOF")
            val h  = ((b(off + 5) & 0xff) << 8) | (b(off + 6) & 0xff)
            val w  = ((b(off + 7) & 0xff) << 8) | (b(off + 8) & 0xff)
            val nc = b(off + 9) & 0xff
            return JpegMeta(d, decode_ok = true, w.toLong, h.toLong, nc.toLong,
              progressive = (m == 0xc2 || m == 0xc6 || m == 0xca || m == 0xce))
          }
          off += 2 + len
      }
    }
    throw new IllegalArgumentException("no SOF")
  }

  /** Attach a REAL encoded JPEG per doc (planted dimensions). */
  def attachJpegPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.tables.Tables
      .rebalanceForCpu(docs.select(col("doc_id").cast("long"))) // encoder-bound scan
      .as[Long]
      .mapPartitions(_.map(d => (d, renderJpeg(d))))
      .toDF("doc_id", "payload")
  }

  /** Parse JPEG headers — malformed rows dead-letter, same shuffle-free
    * header-bytes scan as the other walks. */
  def parseJpegMeta(df: DataFrame): Dataset[JpegMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (d, b) =>
        try parseJpeg(d, b)
        catch {
          case _: RuntimeException => JpegMeta(d, decode_ok = false, 0L, 0L, 0L, progressive = false)
        }
      })
  }

  // --- surface ----------------------------------------------------------

  /** Attach a planted container payload per doc: even ids → MP4, odd →
    * WebM (two container families through one parse surface). */
  def attachContainerPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs // byte-arithmetic render is trivial per row — rebalance not worth its shuffle
      .select(col("doc_id").cast("long"))
      .as[Long]
      .mapPartitions(_.map(d => (d, if (d % 2 == 0) renderMp4(d) else renderWebm(d))))
      .toDF("doc_id", "payload")
  }

  /** Parse the container header of each payload — dispatch on magic
    * bytes, malformed rows dead-letter as decode_ok=false. Shuffle-free
    * narrow map; only header bytes are touched. */
  def parseContainerMeta(df: DataFrame): Dataset[ContainerMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (d, b) =>
        try {
          if (b.length >= 12 && fourcc(b, 4) == "ftyp") parseMp4(d, b)
          else if (b.length >= 4 && b.take(4).sameElements(IdEbml)) parseWebm(d, b)
          else ContainerMeta(d, decode_ok = false, "unknown", "", 0L, 0L, 0L, "")
        } catch {
          case _: RuntimeException =>
            ContainerMeta(d, decode_ok = false, "unknown", "", 0L, 0L, 0L, "")
        }
      })
  }
}
