package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (SURVEY.md §2.D D8): media as opaque
  * `BinaryType` payloads plus a typed metadata struct, with the
  * decode/feature-extract/resize/frame-sample stages implemented as
  * `mapPartitions` over the binary column (the Scala-side equivalent of the
  * Python `mapInPandas` batch-UDF pattern).
  *
  * The actual codec step is a clearly-marked deterministic STUB — image and
  * audio libraries are not available in this build environment — but the
  * Spark-side plumbing (schema, encoders, per-partition batching,
  * partition-preserving execution) is real and tested in MultimodalSpec.
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
}
