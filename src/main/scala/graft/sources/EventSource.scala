package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}

/** Source abstraction for the event feed (SURVEY.md §2.A A1).
  *
  * The reference consumes an AWS Kinesis shard stream (README.md:2). No
  * Kinesis connector ships in this build environment (and none should be
  * baked in — SURVEY §7.4.5), so the feed is modeled as a trait with a
  * batch view and a streaming view of the same schema. A Kinesis DSv2
  * connector slots in as another implementation without touching any
  * operator: everything downstream consumes a plain (streaming) DataFrame.
  * The shard-semantics half of that connector already exists:
  * [[graft.sources.sharded.ShardedStreamProvider]] is a full DSv2
  * MicroBatchStream with per-shard offsets, checkpoint resume, and
  * ReadLimit admission control — only the service-API backend (the part
  * requiring the AWS SDK) is substituted with a directory layout.
  *
  * Scale: the file implementation relies on Spark's file-stream source —
  * checkpointed offsets, `maxFilesPerTrigger` backpressure; shard ordering
  * maps to per-partition ordering exactly as Kinesis shards map to
  * partitions.
  */
trait EventSource {
  def read(spark: SparkSession): DataFrame
  def readStream(spark: SparkSession): DataFrame
}

object EventSource {

  /** The Kinesis record shape (SURVEY.md §1.1): opaque payload plus
    * partition key / sequence number / arrival timestamp — the same
    * four-column frame Spark's Kafka source exposes, so a future Kinesis
    * DSv2 connector drops in schema-compatibly. `ArcPipeline` consumes
    * `payload`; ordering guarantees ride on (partition_key,
    * sequence_number) exactly as Kinesis shard order does. */
  val recordSchema: StructType = StructType(
    Seq(
      StructField("payload", org.apache.spark.sql.types.BinaryType),
      StructField("partition_key", org.apache.spark.sql.types.StringType),
      StructField("sequence_number", org.apache.spark.sql.types.StringType),
      StructField("arrival_ts", org.apache.spark.sql.types.TimestampType)
    )
  )
}

/** Parquet-directory implementation — the batch twin and the file-stream
  * twin of the Kinesis feed. */
final class FileEventSource(path: String, schema: StructType, maxFilesPerTrigger: Int = 1)
    extends EventSource {

  override def read(spark: SparkSession): DataFrame =
    spark.read.schema(schema).parquet(path)

  override def readStream(spark: SparkSession): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)
}

/** Generic columnar-file implementation over any Spark batch+stream file
  * format (`parquet`, `orc`, `csv`, `json`) — same contract, one format
  * knob. CSV gets header handling; all formats keep the explicit schema
  * (schema inference is banned on the 100 TB path: one pass over the data
  * just to guess types). */
final class FormatEventSource(
    path: String,
    schema: StructType,
    format: String,
    maxFilesPerTrigger: Int = 1
) extends EventSource {

  private def opts: Map[String, String] =
    if (format == "csv") Map("header" -> "true") else Map.empty

  override def read(spark: SparkSession): DataFrame =
    spark.read.schema(schema).options(opts).format(format).load(path)

  override def readStream(spark: SparkSession): DataFrame =
    spark.readStream
      .schema(schema)
      .options(opts + ("maxFilesPerTrigger" -> maxFilesPerTrigger.toString))
      .format(format)
      .load(path)
}

/** JSON-lines implementation — the Arc feed's native wire format (one
  * gzipped JSON event per Kinesis record; as files: .json/.json.gz lines,
  * decompressed transparently by the codec factory). PERMISSIVE mode with
  * a corrupt-record column preserves the A8 dead-letter contract at the
  * source boundary. */
final class JsonLinesEventSource(path: String, schema: StructType, maxFilesPerTrigger: Int = 1)
    extends EventSource {

  private def withCorrupt(s: StructType): StructType =
    if (s.fieldNames.contains("_corrupt")) s
    else s.add("_corrupt", org.apache.spark.sql.types.StringType)

  override def read(spark: SparkSession): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  override def readStream(spark: SparkSession): DataFrame =
    spark.readStream
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)
}
