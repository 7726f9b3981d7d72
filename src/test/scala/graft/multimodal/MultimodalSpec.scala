package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet").limit(50)

  test("attachPayload: binary payload + typed metadata struct") {
    val mm = Multimodal.attachPayload(docs)
    val schema = mm.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("meta").dataType === Multimodal.metaSchema)
    val row = mm.select(col("meta.mime"), length(col("payload")), col("n_chars")).collect().head
    assert(row.getString(0) === "text/plain")
    assert(row.getInt(1) === row.getLong(2).toInt) // ascii corpus: bytes == chars
  }

  test("metadata filter prunes before decode (predicate on meta only)") {
    val mm = Multimodal.attachPayload(docs).filter(col("meta.width") > 200)
    assert(mm.count() > 0)
    assert(mm.select(min(col("meta.width"))).collect().head.getLong(0) > 200)
  }

  test("decodeFeatures: deterministic stub features, stable schema, batched") {
    val decoded = Multimodal.decodeFeatures(Multimodal.attachPayload(docs), dim = 8)
    val rows = decoded.collect()
    assert(rows.length === 50)
    assert(rows.forall(_.features.length === 8))
    val again = Multimodal.decodeFeatures(Multimodal.attachPayload(docs), dim = 8).collect()
    assert(rows.map(_.features.toSeq).toSeq === again.map(_.features.toSeq).toSeq)
  }

  test("resize: payload shrinks by factor, metadata width tracks it") {
    val mm = Multimodal.attachPayload(docs)
    val rs = Multimodal.resize(mm, factor = 4)
    // same field names/types as the canonical meta schema (nullability
    // flags differ through the typed-map roundtrip)
    val metaFields = rs.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(metaFields.fields.map(f => (f.name, f.dataType)).toSeq ===
      Multimodal.metaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val joined = mm.select(col("doc_id"), length(col("payload")).as("orig"))
      .join(rs.select(col("doc_id"), length(col("payload")).as("small"), col("meta.width").as("w")), "doc_id")
      .collect()
    joined.foreach { r =>
      val orig = r.getInt(1); val small = r.getInt(2)
      assert(small === (orig + 3) / 4, s"doc ${r.getLong(0)}: $orig -> $small")
    }
    // deterministic
    val twice = Multimodal.resize(mm, 4).select("doc_id", "payload").collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    val once  = rs.select("doc_id", "payload").collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    assert(once === twice)
  }

  test("image decode: javax.imageio roundtrip recovers exact pixel sums") {
    val mm      = Multimodal.attachImagePayload(docs, 16, 16)
    val decoded = Multimodal.decodeImage(mm).collect()
    assert(decoded.length === 50)
    decoded.foreach { d =>
      assert(d.decode_ok, s"doc ${d.doc_id} failed to decode")
      assert(d.width === 16L && d.height === 16L)
      // expected sums straight from the pixel formula (PNG is lossless)
      var er = 0L; var eg = 0L; var eb = 0L
      for (y <- 0 until 16; x <- 0 until 16) {
        er += (d.doc_id * 31 + x * 7 + y * 13) % 256
        eg += (d.doc_id * 17 + x * 5 + y * 29) % 256
        eb += (d.doc_id * 23 + x * 3 + y * 11) % 256
      }
      assert((d.sum_r, d.sum_g, d.sum_b) === ((er, eg, eb)), s"doc ${d.doc_id}")
    }
  }

  test("image decode: non-image payload surfaces as decode_ok=false, task survives") {
    val mm      = Multimodal.attachPayload(docs) // UTF-8 text bytes, not an image
    val decoded = Multimodal.decodeImage(mm).collect()
    assert(decoded.length === 50)
    assert(decoded.forall(d => !d.decode_ok && d.width === 0L && d.sum_r === 0L))
  }

  test("image resize: real bilinear rescale — dims, determinism, brightness preserved") {
    val mm = Multimodal.attachImagePayload(docs, 16, 16)
    val rs = Multimodal.resizeImage(mm, 8, 8)
    assert(rs.filter(!col("resized")).count() === 0L)
    assert(rs.filter(col("meta.width") =!= 8 || col("meta.height") =!= 8).count() === 0L)
    val redecoded = Multimodal.decodeImage(rs).collect()
    assert(redecoded.forall(d => d.decode_ok && d.width === 8L && d.height === 8L))
    // bilinear downsample preserves mean brightness up to interpolation error
    val orig = Multimodal.decodeImage(mm).collect().map(d => d.doc_id -> d).toMap
    redecoded.foreach { d =>
      val o         = orig(d.doc_id)
      val meanSmall = (d.sum_r + d.sum_g + d.sum_b) / (3.0 * 8 * 8)
      val meanOrig  = (o.sum_r + o.sum_g + o.sum_b) / (3.0 * 16 * 16)
      assert(math.abs(meanSmall - meanOrig) < 32.0,
        s"doc ${d.doc_id}: mean $meanOrig -> $meanSmall")
    }
    // byte-deterministic across runs (same JVM codec)
    val a = Multimodal.resizeImage(mm, 8, 8).select("doc_id", "payload").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    val b = rs.select("doc_id", "payload").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    assert(a === b)
  }

  test("audio decode: javax.sound WAV roundtrip recovers exact sample sums") {
    val mm      = Multimodal.attachAudioPayload(docs, 256, 8000)
    val decoded = Multimodal.decodeAudio(mm).collect()
    assert(decoded.length === 50)
    decoded.foreach { d =>
      assert(d.decode_ok, s"doc ${d.doc_id} failed to decode")
      assert(d.sample_rate === 8000L && d.n_samples === 256L)
      var es = 0L; var ea = 0L
      for (i <- 0 until 256) {
        val s = ((d.doc_id * 31 + i * 7) % 65536) - 32768
        es += s; ea += math.abs(s)
      }
      assert((d.sum_s, d.sum_abs) === ((es, ea)), s"doc ${d.doc_id}")
    }
  }

  test("audio decode: non-audio payload surfaces as decode_ok=false") {
    val decoded = Multimodal.decodeAudio(Multimodal.attachPayload(docs)).collect()
    assert(decoded.length === 50)
    assert(decoded.forall(d => !d.decode_ok && d.n_samples === 0L))
  }

  test("frameSample: strided chunks with correct indices") {
    val frames = Multimodal.frameSample(Multimodal.attachPayload(docs), chunkBytes = 64, stride = 2)
    val perDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"), max("frame_idx").as("maxi"))
      .collect()
    assert(perDoc.nonEmpty)
    // every kept index is even (stride 2)
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() === 0L)
  }

  test("video frames: multi-frame GIF roundtrip — count, stride, exact gray sums") {
    val mm      = Multimodal.attachVideoPayload(docs, w = 8, h = 8, nFrames = 5)
    val decoded = Multimodal.sampleVideoFrames(mm, stride = 2).collect()
    // 5 frames, stride 2 -> frames 0, 2, 4 per doc.
    assert(decoded.length === 50 * 3)
    decoded.foreach { d =>
      assert(d.decode_ok && d.n_frames === 5L && d.width === 8L && d.height === 8L)
      assert(d.frame_idx % 2 === 0L)
      var es = 0L
      for (x <- 0 until 8; y <- 0 until 8)
        es += ((d.doc_id * 31 + d.frame_idx * 19 + x * 7 + y * 13) % 256)
      assert(d.sum_gray === es, s"doc ${d.doc_id} frame ${d.frame_idx}")
    }
  }

  test("video frames: stride 1 decodes every frame; non-container payload dead-letters") {
    val all = Multimodal.sampleVideoFrames(
      Multimodal.attachVideoPayload(docs.limit(5), 8, 8, 4), stride = 1).collect()
    assert(all.length === 5 * 4)
    assert(all.map(_.frame_idx).toSet === Set(0L, 1L, 2L, 3L))
    val bad = Multimodal.sampleVideoFrames(Multimodal.attachPayload(docs.limit(5)), stride = 1)
      .collect()
    assert(bad.length === 5)
    assert(bad.forall(d => !d.decode_ok && d.frame_idx === -1L))
  }

  test("aHash: deterministic, resize-robust, discriminative, malformed-tolerant") {
    import org.apache.spark.sql.functions._
    val imgs = Multimodal.attachImagePayload(docs.limit(20), 16, 16)
    val h = Multimodal.imageAHashes(imgs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(h.forall(_._3))
    // identical payload → identical hash (rerun)
    val h2 = Multimodal.imageAHashes(imgs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(h.sortBy(_._1).toSeq === h2.sortBy(_._1).toSeq)
    // resize robustness: 2× bilinear upscale + PNG re-encode keeps the
    // hash within a small Hamming radius (byte hashes share ZERO bits of
    // structure after re-encode)
    val hr = Multimodal.imageAHashes(Multimodal.resizeImage(imgs, 32, 32)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val hams = h.map { case (id, hash, _) => java.lang.Long.bitCount(hash ^ hr(id)) }
    assert(hams.forall(_ <= 12), s"resize broke the hash: ${hams.toSeq}")
    // discrimination: distinct synthetic images do not all collide
    assert(h.map(_._2).distinct.length > 10, "aHash degenerate across distinct images")
    // malformed tolerance
    val bad = Multimodal.imageAHashes(Multimodal.attachPayload(docs.limit(3))).collect()
    assert(bad.forall(r => !r.getBoolean(2) && r.getLong(1) === 0L))
  }
}
