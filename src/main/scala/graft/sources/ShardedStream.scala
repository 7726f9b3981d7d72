package graft.sources.sharded

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch,
  InputPartition,
  PartitionReader,
  PartitionReaderFactory,
  Scan,
  ScanBuilder
}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream,
  Offset,
  ReadLimit,
  ReadMaxRows,
  SupportsAdmissionControl,
  SupportsTriggerAvailableNow
}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSource V2 connector for a SHARDED EVENT STREAM — the engine's A1
  * seam (SURVEY §2.A) implemented on Spark's public connector API rather
  * than the built-in file source, so the semantics match a shard-oriented
  * feed (Kinesis/Kafka shape) exactly:
  *
  *  - the stream is a set of numbered shards, each an ordered sequence of
  *    records with a monotonically increasing per-shard sequence number;
  *  - a streaming OFFSET is a per-shard high-water mark (`{shard: seq}`),
  *    so checkpoint resume re-reads nothing and loses nothing, per shard;
  *  - each micro-batch plans ONE InputPartition per shard with a
  *    (fromSeq, untilSeq) range — reader parallelism = shard count, the
  *    same contract as Kinesis shard iterators or Kafka partitions;
  *  - admission control (`maxRecordsPerTrigger`) bounds a micro-batch's
  *    total records via Spark's ReadLimit, spreading the budget over
  *    shards — an unbounded backlog cannot produce an unbounded batch.
  *
  * The physical backing here is a directory layout `path/shard=N/<file>` where
  * each file holds newline-delimited payloads (a crawl/firehose dump, and
  * what the fixture tests write); a cloud implementation swaps
  * [[ShardBackend]] for the service's iterator API — every Spark-facing
  * class in this file is backend-agnostic. The AWS SDK is unavailable in
  * this build environment by policy (SURVEY §7.4.5), so the service
  * backend is deliberately out of scope.
  *
  * Schema: (shard INT, seq BIGINT, payload STRING) — payload then flows
  * into the existing decode path (ArcPipeline / A3–A8), which is where
  * typed parsing belongs (decode is a QUERY concern; the transport stays
  * schema-free, exactly like the reference's feed).
  */
class ShardedStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShardedStream.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ShardedTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object ShardedStream {
  val schema: StructType = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("payload", StringType, nullable = true)
  ))

  /** RESHARD the stream: close every shard in `parents` and declare
    * `children` as their successors (Kinesis split = 1 parent → 2
    * children, merge = 2 parents → 1 child; both are this one operation).
    * Writes the lineage markers the reader gates on: `_closed` in each
    * parent dir (no more appends), `_parents` in each child dir naming
    * the parents. Appends already written to a child before the reshard
    * call are illegal (children BEGIN at the reshard), matching the
    * service contract where children do not exist until the split. */
  def reshard(root: String, parents: Seq[Int], children: Seq[Int]): Unit = {
    require(parents.nonEmpty && children.nonEmpty, "reshard needs parents and children")
    val spark = SparkSession.active
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    parents.foreach { p =>
      val dir = new Path(rootPath, s"shard=$p")
      require(fs.exists(dir), s"cannot close absent shard $p")
      fs.create(new Path(dir, "_closed"), true).close()
    }
    children.foreach { c =>
      val dir = new Path(rootPath, s"shard=$c")
      fs.mkdirs(dir)
      val out = fs.create(new Path(dir, "_parents"), true)
      try out.write(parents.sorted.mkString(",").getBytes("UTF-8"))
      finally out.close()
    }
  }
}

/** Directory-backed shard access. Planning needs per-file RECORD counts
  * (offsets are record sequence numbers, the Kinesis contract), and a
  * plain file has no record count in its metadata — so the backend counts
  * each file's lines ONCE when it first appears and caches by
  * (path, mtime, len). Amortized driver cost is therefore one pass over
  * each file's bytes over the stream's lifetime, incremental per trigger
  * (steady-state planning is one LIST plus counts of the NEW files only);
  * a service backend (Kinesis/Kafka) gets sequence numbers from the
  * service and skips counting entirely. The cache grows one small entry
  * per file — bounded by the retention of the directory, not the data.
  *
  * Append-only assumption: sequence numbers are DERIVED from the sorted
  * file listing, so deleting or rewriting an already-consumed file would
  * shift every later record's seq and corrupt checkpointed offsets. The
  * directory backend therefore requires append-only shard dirs (compact/
  * expire only beyond a consumer horizon); service backends carry
  * absolute sequence numbers and have no such constraint. */
private[sharded] object ShardBackend {

  /** shard id -> ordered list of (file path, record count). */
  private val countCache = scala.collection.concurrent.TrieMap.empty[(String, Long, Long), Long]

  def shardFiles(root: String): Map[Int, Seq[(String, Long)]] = {
    val spark = SparkSession.active
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return Map.empty
    fs.listStatus(rootPath)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
      .map { dir =>
        val shard = dir.getPath.getName.stripPrefix("shard=").toInt
        val files = fs
          .listStatus(dir.getPath)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
          .sortBy(_.getPath.getName)
          .map { f =>
            val key = (f.getPath.toString, f.getModificationTime, f.getLen)
            val n = countCache.getOrElseUpdate(key, countLines(f.getPath, fs))
            (f.getPath.toString, n)
          }
          .toSeq
        shard -> files
      }
      .toMap
  }

  private def countLines(p: Path, fs: org.apache.hadoop.fs.FileSystem): Long = {
    val in = fs.open(p)
    try {
      val reader = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
      var n = 0L
      while (reader.readLine() != null) n += 1
      n
    } finally in.close()
  }

  /** Current high-water mark per shard (total records). */
  def latestSeqs(root: String): Map[Int, Long] =
    shardFiles(root).map { case (s, files) => s -> files.map(_._2).sum }

  /** Reshard lineage markers (the DescribeStream view a service backend
    * reports): which shards are CLOSED (`_closed` marker — no further
    * appends) and each shard's declared PARENTS (`_parents` file — the
    * shard is a reshard child and must not be consumed past its parents).
    * One LIST per trigger, piggybacking the shard listing's scale. */
  def lineage(root: String): (Map[Int, Seq[Int]], Set[Int]) = {
    val spark = SparkSession.active
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return (Map.empty, Set.empty)
    val dirs = fs.listStatus(rootPath)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
    val closed = dirs.collect {
      case d if fs.exists(new Path(d.getPath, "_closed")) =>
        d.getPath.getName.stripPrefix("shard=").toInt
    }.toSet
    val parents = dirs.flatMap { d =>
      val pf = new Path(d.getPath, "_parents")
      if (!fs.exists(pf)) None
      else {
        val in = fs.open(pf)
        val body =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        val ps = body.split(",").iterator.map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
        if (ps.isEmpty) None
        else Some(d.getPath.getName.stripPrefix("shard=").toInt -> ps)
      }
    }.toMap
    (parents, closed)
  }
}

class ShardedTable(path: String)
    extends Table
    with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(path != null, "sharded stream requires a path option")
  override def name(): String = s"sharded_stream($path)"
  override def schema(): StructType = ShardedStream.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new ShardedScan(path, options)
    }

  // WRITE half (A9 on DSv2): same layout, two-phase rename commit — see
  // ShardedSink.scala.
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo): org.apache.spark.sql.connector.write.WriteBuilder =
    new ShardedWriteBuilder(path, info)
}

class ShardedScan(path: String, options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = ShardedStream.schema

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ShardedMicroBatchStream(path, options)

  /** Batch form: the full current range — lets the same layout be
    * backfilled with ordinary batch queries. */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val files = ShardBackend.shardFiles(path)
      files.toArray.sortBy(_._1).map { case (shard, fs) =>
        ShardRangePartition(shard, 0L, fs.map(_._2).sum, fs): InputPartition
      }
    }
    override def createReaderFactory(): PartitionReaderFactory = new ShardReaderFactory
  }
}

/** Per-shard record-range offsets, JSON `{"0":12,"1":40}` (shard-sorted,
  * so serialization is canonical and offset equality is string equality —
  * what Spark's streaming engine compares for progress). */
case class ShardedOffset(seqs: Map[Int, Long]) extends Offset {
  override def json(): String =
    seqs.toSeq.sorted.map { case (s, n) => s""""$s":$n""" }.mkString("{", ",", "}")
}

object ShardedOffset {
  def fromJson(json: String): ShardedOffset = {
    val body = json.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) ShardedOffset(Map.empty)
    else
      ShardedOffset(
        body
          .split(",")
          .map { kv =>
            val Array(k, v) = kv.split(":").map(_.trim)
            k.stripPrefix("\"").stripSuffix("\"").toInt -> v.toLong
          }
          .toMap)
  }
}

class ShardedMicroBatchStream(path: String, options: CaseInsensitiveStringMap)
    extends MicroBatchStream
    with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val maxPerTrigger: Option[Long] =
    Option(options.get("maxRecordsPerTrigger")).map(_.toLong)

  // Trigger.AvailableNow contract: pin the stream's end at query start so
  // the run drains exactly the records that existed then (in
  // admission-control-sized micro-batches) and terminates, even if new
  // files keep landing.
  private var availableNowTarget: Option[Map[Int, Long]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(ShardBackend.latestSeqs(path))
  private def head(): Map[Int, Long] =
    availableNowTarget.getOrElse(ShardBackend.latestSeqs(path))

  override def initialOffset(): Offset = ShardedOffset(Map.empty)

  override def deserializeOffset(json: String): Offset = ShardedOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  /** Unbounded head — what the engine logs as the stream's true end. */
  override def reportLatestOffset(): Offset = ShardedOffset(head())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("latestOffset(start, limit) is used (admission control)")

  /** RESHARD GATE (split/merge lineage, the Kinesis parent-child
    * contract): a child shard's records are not admitted until every
    * parent is CLOSED and fully consumed at the current start offset —
    * until then the child's admissible head is pinned at the consumer's
    * own position. Because the gate opens only on a batch BOUNDARY (the
    * batch that drains the parent commits its offset first; the next
    * `latestOffset` sees the parent drained and unlocks the child), no
    * micro-batch ever mixes a parent's tail with its children's heads —
    * per-parent order is preserved across the reshard, and checkpoint
    * resume needs nothing beyond the per-shard map (lineage is backend
    * metadata, re-read each trigger, exactly like DescribeStream).
    * A parent whose directory has been retention-expired counts as
    * drained — its data is gone for every consumer, again the service
    * behavior. Gating is transitive through generations: a grandchild's
    * parent (the child) cannot itself be drained before ITS parents. */
  private def gatedHead(from: Int => Long): Map[Int, Long] = {
    val latest = head()
    val (parents, closed) = ShardBackend.lineage(path)
    def drained(s: Int): Boolean =
      !latest.contains(s) || (closed.contains(s) && from(s) >= latest(s))
    latest.map { case (s, h) =>
      if (parents.getOrElse(s, Nil).forall(drained)) s -> h else s -> from(s)
    }
  }

  /** Admission-controlled head: cap total new records at the ReadLimit,
    * splitting the budget evenly across shards with a backlog (remainder
    * to the lowest shard ids — deterministic, so offset progression is
    * replayable from the checkpoint log). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from   = start.asInstanceOf[ShardedOffset].seqs.withDefaultValue(0L)
    val head   = gatedHead(from)
    val budget = limit match {
      case m: ReadMaxRows => m.maxRows()
      case _              => Long.MaxValue
    }
    val backlogged = head.toSeq.sortBy(_._1).filter { case (s, h) => h > from(s) }
    if (backlogged.isEmpty || budget == Long.MaxValue)
      ShardedOffset(head)
    else {
      val perShard = math.max(1L, budget / backlogged.size)
      var remaining = budget
      val next = head.map { case (s, h) =>
        val take =
          if (h <= from(s) || remaining <= 0) 0L
          else math.min(math.min(perShard, remaining), h - from(s))
        remaining -= take
        s -> (from(s) + take)
      }
      ShardedOffset(next)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from  = start.asInstanceOf[ShardedOffset].seqs.withDefaultValue(0L)
    val until = end.asInstanceOf[ShardedOffset].seqs
    // File lists are pinned at PLANNING time and shipped inside the
    // partition: executors never re-list (no driver-state dependency on the
    // executor, and no race with files that appear mid-batch).
    val files = ShardBackend.shardFiles(path)
    until.toArray.sortBy(_._1).collect {
      case (shard, untilSeq) if untilSeq > from(shard) =>
        ShardRangePartition(shard, from(shard), untilSeq, files.getOrElse(shard, Seq.empty)): InputPartition
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = new ShardReaderFactory

  override def commit(end: Offset): Unit = () // nothing to acknowledge (files are durable)

  override def stop(): Unit = ()
}

/** One shard's (fromSeq, untilSeq) record range plus the file list pinned
  * at planning time — the unit of reader parallelism. Serializable:
  * shipped to executors. */
case class ShardRangePartition(
    shard: Int,
    fromSeq: Long,
    untilSeq: Long,
    files: Seq[(String, Long)])
    extends InputPartition

class ShardReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardRangePartition]
    new ShardRangeReader(p)
  }
}

/** Streams one shard's range: walks the pinned file list in order, skips
  * whole files below `fromSeq` by their record counts (never reads skipped
  * bytes), emits (shard, seq, payload) until `untilSeq`. Executor-side,
  * lazy, one open file at a time. */
class ShardRangeReader(p: ShardRangePartition) extends PartitionReader[InternalRow] {
  private val conf =
    new org.apache.hadoop.conf.Configuration() // executor-side: default FS config reads local/HDFS URIs in the path

  private var fileIdx                        = 0
  private var seq                            = 0L
  private var reader: java.io.BufferedReader = null
  private var current: InternalRow           = null

  // Skip whole files strictly below fromSeq.
  locally {
    while (fileIdx < p.files.length && seq + p.files(fileIdx)._2 <= p.fromSeq) {
      seq += p.files(fileIdx)._2
      fileIdx += 1
    }
  }

  private def openNext(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    if (fileIdx >= p.files.length) false
    else {
      val path = new Path(p.files(fileIdx)._1)
      val fs   = path.getFileSystem(conf)
      reader = new java.io.BufferedReader(new java.io.InputStreamReader(fs.open(path), "UTF-8"))
      fileIdx += 1
      true
    }
  }

  override def next(): Boolean = {
    // Iterative: also drains the skipped head of a partially-consumed
    // file without recursion (a large fromSeq must not blow the stack).
    while (seq < p.untilSeq) {
      var line: String = null
      while (line == null) {
        if (reader == null && !openNext()) return false
        line = reader.readLine()
        if (line == null) reader = null // advance to the shard's next file
      }
      val emit = seq >= p.fromSeq
      seq += 1
      if (emit) {
        current = InternalRow(p.shard, seq - 1, UTF8String.fromString(line))
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current

  override def close(): Unit = if (reader != null) reader.close()
}
