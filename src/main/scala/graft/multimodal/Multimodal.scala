package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (SURVEY.md §2.D D8): media as opaque
  * `BinaryType` payloads plus a typed metadata struct, with the
  * decode/feature-extract/resize/frame-sample stages implemented as
  * `mapPartitions` over the binary column (the Scala-side equivalent of the
  * Python `mapInPandas` batch-UDF pattern).
  *
  * The IMAGE, AUDIO, and VIDEO-frame paths are real: [[decodeImage]] /
  * [[resizeImage]] run the JDK's own `javax.imageio` PNG codec inside the
  * partition map (decode, pixel statistics, bilinear rescale, re-encode),
  * [[decodeAudio]] parses WAV/PCM through `javax.sound.sampled` (no
  * external libraries, no audio device — pure stream parsing), and
  * [[sampleVideoFrames]] seek-decodes every stride-th frame of a
  * multi-frame container through `ImageReader`'s multi-image API
  * (animated GIF — the one frame container the JDK reads natively;
  * MP4/H.264 codecs don't exist in this build environment, so
  * [[stubDecode]] / [[frameSample]] keep the clearly-marked byte-level
  * stub shape for those). All of it is tested in MultimodalSpec.
  *
  * 100 TB design: payloads never pass through the driver; decode runs
  * per-partition with a bounded batch; metadata filters are plain Column
  * predicates so Catalyst prunes/pushes them before any decode work —
  * filter-by-meta THEN decode is the cheap plan, and the API shapes callers
  * into it.
  */
object Multimodal {

  val metaSchema: StructType = StructType(
    Seq(
      StructField("mime", StringType, nullable = false),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("duration_ms", LongType)
    )
  )

  /** Wrap a text corpus as a multimodal table: payload = UTF-8 bytes,
    * meta.width carries n_chars (a stand-in for pixel width on the synthetic
    * fixture; a real ingest fills meta from container headers). */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.withColumn(
      "payload",
      encode(col("text"), "UTF-8")
    ).withColumn(
      "meta",
      struct(
        lit("text/plain").as("mime"),
        col("n_chars").cast("long").as("width"),
        lit(null).cast("long").as("height"),
        lit(null).cast("long").as("duration_ms")
      )
    )

  final case class DecodedMedia(
      doc_id: Long,
      mime: String,
      n_bytes: Long,
      features: Array[Float]
  )

  /** STUB decoder: a real implementation hands `payload` to an image/audio
    * codec here. This deterministic fake derives a fixed-length feature
    * vector from the bytes so the distributed plumbing (schema, encoder,
    * partition batching) is fully exercisable without codec libraries. */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Decode stage: per-partition batch decode of the payload column into
    * typed features. `mapPartitions` keeps the iterator lazy — constant
    * memory per task regardless of partition size. */
  def decodeFeatures(df: DataFrame, dim: Int = 8): Dataset[DecodedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("meta.mime").as("mime"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, mime, payload) =>
          DecodedMedia(id, mime, payload.length.toLong, stubDecode(payload, dim))
        }
      }
  }

  /** Deterministic synthetic PNG: a w×h RGB image whose channel values are
    * simple modular arithmetic in (doc_id, x, y). PNG is lossless, so a
    * decode recovers these exact values — which makes the REAL codec
    * roundtrip cross-engine checkable: DuckDB reproduces the expected pixel
    * sums from the same arithmetic over a generate_series grid, no image
    * library required on the oracle side. */
  def renderPng(docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((docId * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((docId * 17 + x * 5 + y * 29) % 256).toInt
        val b = ((docId * 23 + x * 3 + y * 11) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Attach a rendered PNG payload per document — the image-corpus stand-in
    * for an ingest that reads real media files. Runs per-partition; payloads
    * never pass through the driver. */
  def attachImagePayload(docs: DataFrame, w: Int = 16, h: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.tables.Tables
      .rebalanceForCpu(docs) // render-bound narrow map; no-op on well-split inputs
      .select(col("doc_id").cast("long").as("doc_id"))
      .as[Long]
      .mapPartitions { ids =>
        ImageIO.setUseCache(false) // no temp-file cache inside executors
        ids.map(id => (id, renderPng(id, w, h)))
      }
      .toDF("doc_id", "payload")
      .withColumn(
        "meta",
        struct(
          lit("image/png").as("mime"),
          lit(w.toLong).as("width"),
          lit(h.toLong).as("height"),
          lit(null).cast("long").as("duration_ms")
        )
      )
  }

  final case class DecodedImage(
      doc_id: Long,
      width: Long,
      height: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      decode_ok: Boolean
  )

  /** REAL image decode: `javax.imageio` reads the payload bytes inside a
    * `mapPartitions` and emits decoder-reported dimensions plus exact
    * per-channel pixel sums (integers — cross-engine hashable with no
    * float tolerance). Payloads no codec accepts surface as
    * `decode_ok = false` with zeroed stats instead of failing the task —
    * the same malformed-tolerance contract as the A8 ingest path. */
  def decodeImage(df: DataFrame): Dataset[DecodedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.map { case (id, payload) =>
          val img =
            try ImageIO.read(new ByteArrayInputStream(payload))
            catch { case _: Exception => null }
          if (img == null) DecodedImage(id, 0L, 0L, 0L, 0L, 0L, decode_ok = false)
          else {
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xff
                sg += (rgb >> 8) & 0xff
                sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            DecodedImage(id, img.getWidth.toLong, img.getHeight.toLong, sr, sg, sb,
              decode_ok = true)
          }
        }
      }
  }

  /** REAL image resize: decode → bilinear `Graphics2D` rescale to
    * (targetW, targetH) → PNG re-encode, all per-partition. Rows whose
    * payload does not decode pass through unchanged (malformed tolerance);
    * metadata tracks the new dimensions. */
  def resizeImage(df: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val resized = df
      .select(col("doc_id").cast("long"), col("meta.mime").as("mime"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.map { case (id, mime, payload) =>
          val img =
            try ImageIO.read(new ByteArrayInputStream(payload))
            catch { case _: Exception => null }
          if (img == null) (id, mime, payload, false)
          else {
            val out = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
            val g   = out.createGraphics()
            g.setRenderingHint(
              RenderingHints.KEY_INTERPOLATION,
              RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, targetW, targetH, null)
            g.dispose()
            val bos = new ByteArrayOutputStream()
            ImageIO.write(out, "png", bos)
            (id, mime, bos.toByteArray, true)
          }
        }
      }
      .toDF("doc_id", "mime", "payload", "resized")
    resized.withColumn(
      "meta",
      struct(
        col("mime"),
        when(col("resized"), lit(targetW.toLong)).otherwise(lit(null).cast("long")).as("width"),
        when(col("resized"), lit(targetH.toLong)).otherwise(lit(null).cast("long")).as("height"),
        lit(null).cast("long").as("duration_ms")
      )
    ).select(col("doc_id"), col("payload"), col("meta"), col("resized"))
  }

  /** Average-hash (aHash) of a decoded image: integer area-average to an
    * 8×8 grayscale grid, one bit per cell (cell ≥ grid mean), packed into
    * a Long. All-integer arithmetic — no Graphics2D resampling, no
    * floats — so the hash is bit-identical on any JVM/partitioning. The
    * property that makes it a DEDUP key where byte hashes fail: the
    * re-encoded, resized, or slightly-recompressed copy of an image
    * averages to (almost) the same 8×8 grid, so near-copies land at small
    * Hamming distance — cluster by exact hash for the strict tier, or
    * LSH-band the 64 bits (16×4) for the banded tier, exactly like the
    * text-side MinHash machinery. */
  def imageAHash(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val sums   = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x  = 0
      while (x < w) {
        val rgb  = img.getRGB(x, y)
        val gray = (((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L) / 1000L
        val c    = cy * 8 + x * 8 / w
        sums(c) += gray
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    val cell = Array.tabulate(64)(i => if (counts(i) == 0) 0L else sums(i) / counts(i))
    val mean = cell.sum / 64
    var hash = 0L
    var i    = 0
    while (i < 64) {
      if (cell(i) >= mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** Per-doc aHash over a (doc_id, payload) frame; undecodable payloads
    * emit `ok = false` with hash 0 (A8 malformed tolerance). */
  def imageAHashes(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.map { case (id, payload) =>
          val img =
            try ImageIO.read(new ByteArrayInputStream(payload))
            catch { case _: Exception => null }
          if (img == null) (id, 0L, false) else (id, imageAHash(img), true)
        }
      }
      .toDF("doc_id", "ahash", "ok")
  }

  /** Deterministic synthetic WAV: 16-bit signed little-endian PCM mono
    * whose sample values are modular arithmetic in (doc_id, sample index),
    * written through the JDK's own `javax.sound.sampled` WAV encoder. Like
    * [[renderPng]], PCM is lossless, so a real decode recovers the exact
    * samples and DuckDB can reproduce the expected sums arithmetically. */
  def renderWav(docId: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (((docId * 31 + i * 7) % 65536) - 32768).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Attach a rendered WAV payload per document (audio-corpus stand-in;
    * payloads render per-partition, never via the driver). */
  def attachAudioPayload(docs: DataFrame, nSamples: Int = 256, sampleRate: Int = 8000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs // NO rebalance here: javax.sound decode downstream serializes on a
      // global provider-registry lock, so added parallelism only adds
      // contention (measured 1.2 s -> 3.3 s at 32 tasks); render is cheap
      .select(col("doc_id").cast("long").as("doc_id"))
      .as[Long]
      .mapPartitions(ids => ids.map(id => (id, renderWav(id, nSamples, sampleRate))))
      .toDF("doc_id", "payload")
      .withColumn(
        "meta",
        struct(
          lit("audio/wav").as("mime"),
          lit(null).cast("long").as("width"),
          lit(null).cast("long").as("height"),
          lit(nSamples.toLong * 1000L / sampleRate).as("duration_ms")
        )
      )
  }

  final case class DecodedAudio(
      doc_id: Long,
      sample_rate: Long,
      n_samples: Long,
      sum_s: Long,
      sum_abs: Long,
      decode_ok: Boolean
  )

  /** REAL audio decode: `javax.sound.sampled` parses the WAV container
    * inside a `mapPartitions` (header → format, frames → 16-bit LE signed
    * samples) and emits exact integer sample sums — no audio device
    * needed, pure stream parsing, headless-safe. Non-audio payloads
    * surface as `decode_ok = false` (A8 malformed-tolerance contract). */
  def decodeAudio(df: DataFrame): Dataset[DecodedAudio] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          try {
            val ais  = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
            val fmt  = ais.getFormat
            val data = ais.readAllBytes()
            ais.close()
            require(
              fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
                fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
              s"unsupported audio format $fmt")
            val n  = data.length / 2
            var ss = 0L; var sa = 0L
            var i  = 0
            while (i < n) {
              val s = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toLong
              ss += s
              sa += math.abs(s)
              i += 1
            }
            DecodedAudio(id, fmt.getSampleRate.toLong, n.toLong, ss, sa, decode_ok = true)
          } catch {
            case _: Exception => DecodedAudio(id, 0L, 0L, 0L, 0L, decode_ok = false)
          }
        }
      }
  }

  /** Resize stage (image stand-in): STUB — a real implementation decodes,
    * scales, re-encodes. The deterministic fake keeps every `factor`-th
    * byte and updates the metadata width accordingly, so the
    * schema/metadata contract (payload shrinks, meta.width tracks it) and
    * the per-partition execution shape are fully exercised. */
  def resize(df: DataFrame, factor: Int): DataFrame = {
    require(factor > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val resized = df
      // meta.width is nullable (metaSchema) — a primitive Long in the tuple
      // encoder would throw on a null width instead of tolerating it like
      // every other degenerate input; Option decodes null safely.
      .select(col("doc_id"), col("meta.mime").as("mime"), col("meta.width").as("width"), col("payload"))
      .as[(Long, String, Option[Long], Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, mime, width, payload) =>
          val out = payload.grouped(factor).map(_.head).toArray
          (id, mime, width.map(w => math.max(1L, w / factor)), out)
        }
      }
      .toDF("doc_id", "mime", "width", "payload")
    resized.withColumn(
      "meta",
      struct(
        col("mime"),
        col("width"),
        lit(null).cast("long").as("height"),
        lit(null).cast("long").as("duration_ms")
      )
    ).select(col("doc_id"), col("payload"), col("meta"))
  }

  /** Frame-sample stage (video stand-in): split the payload into
    * fixed-size chunks and keep every `stride`-th chunk — the real
    * implementation seeks keyframes; the batching/explode shape is what a
    * 100 TB pipeline needs either way. */
  def frameSample(df: DataFrame, chunkBytes: Int, stride: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val frames = df
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        payload
          .grouped(chunkBytes)
          .zipWithIndex
          .collect { case (chunk, idx) if idx % stride == 0 => (id, idx.toLong, chunk) }
      }
    frames.toDF("doc_id", "frame_idx", "frame_bytes")
  }

  /** Deterministic synthetic "video": an n-frame GRAYSCALE animated GIF
    * whose per-frame pixel values are modular arithmetic in
    * (doc_id, frame, x, y), written through the JDK's own GIF sequence
    * writer. Grayscale is the losslessness trick ([[renderPng]]'s role
    * reprised): a `TYPE_BYTE_GRAY` frame has ≤256 distinct values, so the
    * GIF palette represents it exactly and a real decode recovers the
    * exact pixels — DuckDB reproduces the expected sums from a
    * generate_series grid, no media library on the oracle side. */
  def renderGif(docId: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos    = new ByteArrayOutputStream()
    val ios    = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img    = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, ((docId * 31 + f * 19 + x * 7 + y * 13) % 256).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Attach a rendered multi-frame GIF payload per document — the
    * video-corpus stand-in. Payloads never pass through the driver. */
  def attachVideoPayload(docs: DataFrame, w: Int = 8, h: Int = 8, nFrames: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.tables.Tables
      .rebalanceForCpu(docs) // render-bound narrow map; no-op on well-split inputs
      .select(col("doc_id").cast("long").as("doc_id"))
      .as[Long]
      .mapPartitions { ids =>
        ImageIO.setUseCache(false)
        ids.map(id => (id, renderGif(id, w, h, nFrames)))
      }
      .toDF("doc_id", "payload")
      .withColumn(
        "meta",
        struct(
          lit("image/gif").as("mime"),
          lit(w.toLong).as("width"),
          lit(h.toLong).as("height"),
          lit(nFrames.toLong * 40L).as("duration_ms") // 25 fps stand-in
        )
      )
  }

  final case class DecodedFrame(
      doc_id: Long,
      frame_idx: Long,
      n_frames: Long,
      width: Long,
      height: Long,
      sum_gray: Long,
      decode_ok: Boolean
  )

  /** REAL frame sampling: open the container with the JDK's multi-image
    * `ImageReader`, count frames (`getNumImages`), and DECODE ONLY every
    * `stride`-th frame — the keyframe-sampling access pattern (seek +
    * selective decode, not decode-everything-then-drop). Emits one row per
    * sampled frame with decoder-reported dimensions and the exact gray
    * pixel sum. Undecodable payloads surface as a single
    * `decode_ok = false` row (frame_idx -1) — the A8 malformed-tolerance
    * contract, not a task failure. */
  def sampleVideoFrames(df: DataFrame, stride: Int): Dataset[DecodedFrame] = {
    require(stride > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.flatMap { case (id, payload) =>
          val iis     = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) {
            iis.close()
            Seq(DecodedFrame(id, -1L, 0L, 0L, 0L, 0L, decode_ok = false))
          } else {
            val reader = readers.next()
            try {
              reader.setInput(iis, false, true)
              val n = reader.getNumImages(true)
              (0 until n by stride).map { f =>
                val img = reader.read(f)
                var s   = 0L
                var y   = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    s += img.getRGB(x, y) & 0xff // grayscale: r = g = b
                    x += 1
                  }
                  y += 1
                }
                DecodedFrame(id, f.toLong, n.toLong, img.getWidth.toLong,
                  img.getHeight.toLong, s, decode_ok = true)
              }
            } catch {
              case _: Exception =>
                Seq(DecodedFrame(id, -1L, 0L, 0L, 0L, 0L, decode_ok = false))
            } finally {
              reader.dispose()
              iis.close()
            }
          }
        }
      }
  }
}
