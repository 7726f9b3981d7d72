package graft.sources.cdc

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Column-pruning scan over a CDC store's bucket directories.
  *
  * Scale shape: planning is nBuckets-bounded driver metadata (the
  * manifest's bucket → dir map came with the table; one LIST per
  * non-empty bucket resolves files). Each input partition is ONE bucket
  * carrying `HasPartitionKey` = its bucket id, and the scan reports
  * `KeyGroupedPartitioning(bucket(n, keys), n)` — together these are
  * what lets Spark prove two store scans co-partitioned and plan their
  * join with no Exchange (storage-partitioned join). Every bucket 0..n-1
  * emits a partition, empty ones included, so both sides of a join
  * always expose identical partition-key sets.
  *
  * The read itself is plain parquet via parquet-hadoop's Group API with
  * the projection pushed into `parquet.read.schema` (only requested
  * columns are materialized). The projection is clipped per file against
  * the file's own schema, so buckets carried by reference across an
  * ADDITIVE schema evolution serve typed NULLs for columns their files
  * predate — the same contract as [[graft.operators.Cdc.servingLayout]]'s
  * DataFrame readers. */
class CdcScanBuilder(table: CdcStoreTable, d: CdcCatalog.StoreDef)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = table.schema()

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve payload field order; an empty projection (count(*)) keeps
    // zero fields and the reader just counts rows
    required = StructType(table.schema().fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = {
    // resolve each non-empty bucket's file list now, on the driver
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val files: Map[Int, Array[String]] = table.bucketDirs.map { case (b, dir) =>
      val p = new Path(dir)
      val fs = p.getFileSystem(conf)
      b -> fs.listStatus(p)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
        .sorted
    }
    new CdcScan(table.name(), required, d.keys, d.nBuckets, files)
  }
}

class CdcScan(
    tableName: String,
    requiredSchema: StructType,
    keys: Seq[String],
    nBuckets: Int,
    filesByBucket: Map[Int, Array[String]])
    extends Scan with Batch with SupportsReportPartitioning {

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"$tableName buckets=$nBuckets cols=${requiredSchema.fieldNames.mkString(",")}"

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.bucket(nBuckets, keys: _*)), nBuckets)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until nBuckets).map { b =>
      CdcBucketPartition(b, filesByBucket.getOrElse(b, Array.empty))
    }.toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory(requiredSchema)
}

case class CdcBucketPartition(bucket: Int, files: Array[String])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

class CdcReaderFactory(requiredSchema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new CdcPartitionReader(partition.asInstanceOf[CdcBucketPartition], requiredSchema)
}

/** Streams one bucket's files. Per file: read the footer, clip the
  * requested projection against the file schema (copying the FILE's
  * parquet types so physical layouts always match), push it through
  * `parquet.read.schema`, then decode Groups positionally. Columns the
  * file predates (additive evolution) decode as NULL. */
class CdcPartitionReader(partition: CdcBucketPartition, requiredSchema: StructType)
    extends PartitionReader[InternalRow] {

  // executor-side: files carry their scheme (file://, hdfs://); a default
  // Configuration resolves the right FileSystem for both
  private val conf = new Configuration()

  private var fileIdx = -1
  private var reader: ParquetReader[org.apache.parquet.example.data.Group] = _
  // for the current file: required-field index → (group field position | -1 for absent)
  private var fieldPos: Array[Int] = _
  private var current: InternalRow = _

  private def openNext(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    fileIdx += 1
    if (fileIdx >= partition.files.length) return false
    val path = new Path(partition.files(fileIdx))
    val footer = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
    val fileSchema = try footer.getFileMetaData.getSchema finally footer.close()
    val present = requiredSchema.fields.filter(f => fileSchema.containsField(f.name))
    val projection = new MessageType("spark_schema",
      present.map(f => fileSchema.getType(Seq(f.name): _*)): _*)
    fieldPos = {
      var pos = -1
      requiredSchema.fields.map { f =>
        if (fileSchema.containsField(f.name)) { pos += 1; pos } else -1
      }
    }
    val fileConf = new Configuration(conf)
    fileConf.set(ReadSupport.PARQUET_READ_SCHEMA, projection.toString)
    reader = ParquetReader.builder(new GroupReadSupport(), path).withConf(fileConf).build()
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (reader == null && !openNext()) return false
      val g = reader.read()
      if (g != null) { current = decode(g); return true }
      reader.close(); reader = null
    }
    false // unreachable
  }

  private def decode(g: org.apache.parquet.example.data.Group): InternalRow = {
    val values = new Array[Any](requiredSchema.length)
    var i = 0
    while (i < requiredSchema.length) {
      val pos = fieldPos(i)
      values(i) =
        if (pos < 0 || g.getFieldRepetitionCount(pos) == 0) null
        else requiredSchema.fields(i).dataType match {
          case LongType    => g.getLong(pos, 0)
          case IntegerType => g.getInteger(pos, 0)
          case DoubleType  => g.getDouble(pos, 0)
          case FloatType   => g.getFloat(pos, 0)
          case StringType  => UTF8String.fromBytes(g.getBinary(pos, 0).getBytes)
          case BooleanType => g.getBoolean(pos, 0)
          case DateType    => g.getInteger(pos, 0) // parquet DATE = days since epoch
          case t => throw new IllegalArgumentException(
            s"unsupported type $t (CdcStoreTable validates at load — this is a bug)")
        }
      i += 1
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (reader != null) { reader.close(); reader = null }
}
