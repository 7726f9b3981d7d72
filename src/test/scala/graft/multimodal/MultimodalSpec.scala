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

  test("frameSample: strided chunks with correct indices") {
    val frames = Multimodal.frameSample(Multimodal.attachPayload(docs), chunkBytes = 64, stride = 2)
    val perDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"), max("frame_idx").as("maxi"))
      .collect()
    assert(perDoc.nonEmpty)
    // every kept index is even (stride 2)
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() === 0L)
  }
}
