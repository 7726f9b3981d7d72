package graft.sources.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.Cdc

/** The store's MATERIALIZED change feed as a catalog table — the Delta
  * Lake streaming-CDF contract on the engine's own store format:
  *
  *   spark.table("graft.x_changes")          // retained CDF history
  *   spark.readStream.table("graft.x_changes") // incremental tail
  *
  * Rows are exactly what the maintenance side landed at `feedPath/v=<id>`
  * ([[Cdc.maintainPartitionedSnapshot]]): the CDF-complete row shape —
  * payload + `_change_type` ∈ {insert, delete, update_preimage,
  * update_postimage} + `_commit_version` — so a downstream [[graft
  * .operators.Ivm]] view maintains incrementally off this table alone.
  *
  * Scale shape: the feed is append-only parquet, one `v=<id>` directory
  * per committed store version. A streaming OFFSET is a committed
  * version number ("everything ≤ v served"); each micro-batch plans one
  * input partition per FILE of the versions in `(start, end]` — no
  * listing beyond the new versions, no join, no state. Batch reads plan
  * every retained version the same way. Column pruning rides the same
  * per-file clipped projection as the store scan, so pre-evolution feed
  * files serve typed NULL for columns they predate.
  *
  * Retention (the Kafka contract, enforced LOUDLY): versions behind the
  * vacuum window are gone. A checkpointed stream that resumes inside the
  * window continues exactly-once; one whose next needed version was
  * vacuumed throws — never silently skips — because a consumer that
  * missed deltas must bootstrap from [[Cdc.readPartitionedSnapshot]],
  * not limp on with diverged state ([[Cdc.readFeedSince]]'s law). */
class CdcFeedTable(tableName: String, d: CdcCatalog.FeedDef) extends Table with SupportsRead {
  import org.apache.spark.sql.connector.catalog.TableCapability._

  private[cdc] val tableSchema: StructType = {
    // additive evolution means the STORE's newest recorded schema is the
    // superset every feed version's files clip into
    val (_, payload, _) = Cdc.servingLayout(SparkSession.active, d.storePath)
    val bad = payload.fields.filterNot(f => CdcCatalog.SupportedTypes.contains(f.dataType))
    require(bad.isEmpty,
      s"unsupported payload types in $tableName: " +
        bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
    StructType(payload.fields
      :+ StructField("_change_type", StringType, nullable = true)
      :+ StructField("_commit_version", LongType, nullable = true)
      // Delta-CDF parity: the committing version's wall clock — served as
      // a per-version constant from the feed commit marker's own mtime
      // (no column in the files, no extra metadata write)
      :+ StructField("_commit_timestamp", TimestampType, nullable = true))
  }

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] = {
    val caps = new java.util.HashSet[TableCapability]()
    caps.add(BATCH_READ); caps.add(MICRO_BATCH_READ); caps
  }
  override def partitioning(): Array[Transform] = Array.empty

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CdcFeedScanBuilder(this, d, options)
}

class CdcFeedScanBuilder(
    table: CdcFeedTable, d: CdcCatalog.FeedDef, options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {

  private var required: StructType = table.schema()
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  // inclusive version bounds accumulated from _commit_version conjuncts
  private var loV: Option[Long] = None
  private var hiV: Option[Long] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(table.schema().fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  /** VERSION pruning for batch consumers: `_commit_version` range
    * conjuncts (=, <, <=, >, >=, IN) narrow which `v=<id>` directories
    * the scan even lists — the incremental catch-up read
    * (`WHERE _commit_version > <checkpoint>`) opens only the new
    * versions' files. Every filter is returned as residual, so Spark
    * re-evaluates it on the rows and pruning stays layout advice, never
    * a correctness dependency. (Batch range reads are HISTORY queries
    * over the retained window — the loud lag contract belongs to the
    * streaming tail and `readFeedSince`, whose resume points promise
    * contiguity.) */
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter]): Array[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources._
    def asLong(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int  => Some(i.toLong)
      case _       => None
    }
    def tighten(lo: Option[Long], hi: Option[Long]): Unit = {
      loV = (loV.toSeq ++ lo.toSeq).maxOption
      hiV = (hiV.toSeq ++ hi.toSeq).minOption
    }
    filters.foreach {
      case EqualTo("_commit_version", v)            => asLong(v).foreach(l => tighten(Some(l), Some(l)))
      case EqualNullSafe("_commit_version", v)      => asLong(v).foreach(l => tighten(Some(l), Some(l)))
      case GreaterThan("_commit_version", v)        => asLong(v).foreach(l => tighten(Some(l + 1), None))
      case GreaterThanOrEqual("_commit_version", v) => asLong(v).foreach(l => tighten(Some(l), None))
      case LessThan("_commit_version", v)           => asLong(v).foreach(l => tighten(None, Some(l - 1)))
      case LessThanOrEqual("_commit_version", v)    => asLong(v).foreach(l => tighten(None, Some(l)))
      case In("_commit_version", vs) if vs.nonEmpty && vs.forall(v => asLong(v).isDefined) =>
        tighten(Some(vs.flatMap(asLong).min), Some(vs.flatMap(asLong).max))
      case _ => ()
    }
    pushed = filters
    filters // all residual: Spark re-checks every predicate on the rows
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  override def build(): Scan = {
    val maxVersions = Option(options.get("maxVersionsPerTrigger")).map { s =>
      val n = s.toInt
      require(n > 0, s"maxVersionsPerTrigger must be positive, got $n")
      n
    }
    val startingVersion = Option(options.get("startingVersion")).map(_.toLong)
    // Delta-CDF parity: a stream may pin its start by COMMIT TIME instead
    // of version — epoch millis or a SQL timestamp string; resolved
    // against the per-version commit markers at stream init
    val startingTimestamp = Option(options.get("startingTimestamp")).map { s =>
      if (s.nonEmpty && s.forall(_.isDigit)) s.toLong
      else java.sql.Timestamp.valueOf(s).getTime
    }
    require(startingVersion.isEmpty || startingTimestamp.isEmpty,
      "startingVersion and startingTimestamp are mutually exclusive")
    new CdcFeedScan(table.name(), required, d, maxVersions, loV, hiV,
      startingVersion, startingTimestamp)
  }
}

class CdcFeedScan(
    tableName: String,
    requiredSchema: StructType,
    d: CdcCatalog.FeedDef,
    maxVersionsPerTrigger: Option[Int] = None,
    loVersion: Option[Long] = None,
    hiVersion: Option[Long] = None,
    startingVersion: Option[Long] = None,
    startingTimestampMillis: Option[Long] = None)
    extends Scan with Batch with SupportsReportStatistics {

  /** Units OVERLAPPING the pushed version range: a compacted segment is
    * included whole when any of its versions is wanted — the residual
    * `_commit_version` predicates (every pushed filter is returned
    * residual) trim the over-read exactly. */
  private[cdc] def plannedUnits: Seq[CdcFeedScan.FeedUnit] =
    CdcFeedScan.retainedUnits(d.feedPath)
      .filter(u => loVersion.forall(u.hi >= _) && hiVersion.forall(u.lo <= _))

  private[cdc] def plannedVersions: Seq[Long] =
    plannedUnits.flatMap(u => u.lo to u.hi)
      .filter(v => loVersion.forall(v >= _) && hiVersion.forall(v <= _))

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this

  /** Real sizes for the planner — the VERSION-PRUNED byte count, so an
    * incremental catch-up read (usually a few small versions) broadcasts
    * when joined against big state instead of being costed like the
    * whole retained history. */
  override def estimateStatistics(): Statistics = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val bytes = plannedUnits.map { u =>
      val dir = new Path(CdcFeedScan.unitDir(d.feedPath, u))
      val fs = dir.getFileSystem(conf)
      fs.listStatus(dir).filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum
    }.sum
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
    }
  }
  override def description(): String = {
    val all = CdcFeedScan.retainedVersions(d.feedPath)
    s"$tableName feed versions=${plannedVersions.size}/${all.size} " +
      s"cols=${requiredSchema.fieldNames.mkString(",")}"
  }

  override def planInputPartitions(): Array[InputPartition] =
    plannedUnits
      .flatMap(u => CdcFeedScan.unitPartitions(d.feedPath, u))
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory(requiredSchema)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CdcFeedStream(tableName, requiredSchema, d, maxVersionsPerTrigger,
      startingVersion, startingTimestampMillis)
}

object CdcFeedScan {

  /** One atomic unit of retained feed history: a single `v=<id>`
    * directory, or a compacted `seg=<from>-<to>` segment
    * ([[Cdc.compactFeed]]) — the latter replays WHOLE (its rows carry
    * `_commit_version`/`_commit_timestamp` as data, so batch residual
    * filters stay exact, but the streaming tail cannot split it). */
  private[cdc] sealed trait FeedUnit {
    def lo: Long; def hi: Long
    def size: Long = hi - lo + 1
  }
  private[cdc] case class SingleVersion(v: Long) extends FeedUnit {
    def lo: Long = v; def hi: Long = v
  }
  private[cdc] case class FeedSegment(lo: Long, hi: Long) extends FeedUnit

  /** Retained units in version order: committed segments plus the single
    * dirs they don't cover (a covered single is a crashed compaction's
    * leftover mid-delete; the segment wins). */
  private[cdc] def retainedUnits(feedPath: String): Seq[FeedUnit] = {
    val spark = SparkSession.active
    val segs = Cdc.feedSegments(spark, feedPath)
    val inSeg = (v: Long) => segs.exists { case (lo, hi) => v >= lo && v <= hi }
    (segs.map { case (lo, hi) => FeedSegment(lo, hi): FeedUnit } ++
      Cdc.feedVersions(spark, feedPath).filterNot(inSeg).map(SingleVersion(_): FeedUnit))
      .sortBy(_.lo)
  }

  private[cdc] def retainedVersions(feedPath: String): Seq[Long] =
    retainedUnits(feedPath).flatMap(u => u.lo to u.hi)

  /** Driver-side listing of one unit directory's part files. */
  private[cdc] def dirFiles(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
      .sorted
  }

  private[cdc] def unitDir(feedPath: String, u: FeedUnit): String = u match {
    case SingleVersion(v)    => s"$feedPath/v=$v"
    case FeedSegment(lo, hi) => s"$feedPath/seg=$lo-$hi"
  }

  /** One input partition per file of one unit. Single versions carry
    * their commit wall-clock (micros) for the `_commit_timestamp`
    * constant the reader serves; segment files carry the timestamp AS
    * DATA (materialized at compaction), flagged `tsInData`. */
  private[cdc] def unitPartitions(feedPath: String, u: FeedUnit): Seq[InputPartition] =
    u match {
      case SingleVersion(v) =>
        val tsMicros =
          graft.operators.Cdc.feedCommitTime(SparkSession.active, feedPath, v) * 1000L
        dirFiles(unitDir(feedPath, u)).map(f =>
          CdcFeedPartition(Array(f), tsMicros): InputPartition)
      case seg: FeedSegment =>
        dirFiles(unitDir(feedPath, seg)).map(f =>
          CdcFeedPartition(Array(f), 0L, tsInData = true): InputPartition)
    }
}

case class CdcFeedPartition(
    files: Array[String],
    commitTsMicros: Long = 0L,
    tsInData: Boolean = false)
    extends InputPartition

/** Version-offset micro-batch tail of the feed. `CdcFeedOffset(v)` means
  * "every committed feed version ≤ v has been served". The maintainer's
  * version ids are Spark streaming batch ids, hence CONSECUTIVE — which
  * is what lets a resume detect a vacuumed gap instead of skipping it.
  *
  * Admission control: `option("maxVersionsPerTrigger", n)` caps each
  * micro-batch at n store versions (carried on Spark's `ReadLimit
  * .maxRows` — the unit here is VERSIONS). The point is catch-up: a
  * consumer resuming after long lag replays the backlog as n-version
  * batches instead of one giant batch sized by its outage. */
class CdcFeedStream(
    tableName: String,
    requiredSchema: StructType,
    d: CdcCatalog.FeedDef,
    maxVersionsPerTrigger: Option[Int] = None,
    startingVersion: Option[Long] = None,
    startingTimestampMillis: Option[Long] = None)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  // Trigger.AvailableNow contract, implemented NATIVELY: Spark's generic
  // wrapper for sources without this trait hides the delegate's
  // getDefaultReadLimit (admission control silently degrades to one
  // drain-everything batch). Pin the end at query start; the run drains
  // up to it in admission-sized batches and terminates even if the
  // maintainer keeps committing.
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit = {
    val units = CdcFeedScan.retainedUnits(d.feedPath)
    availableNowCap = Some(if (units.isEmpty) Long.MinValue else units.last.hi)
  }

  override def initialOffset(): Offset = {
    val units = CdcFeedScan.retainedUnits(d.feedPath)
    if (units.isEmpty) throw new IllegalStateException(
      s"no committed feed versions under ${d.feedPath} — start the stream after " +
        "the store's maintainer has committed at least one feed version")
    startingVersion match {
      case Some(v) =>
        // Delta's startingVersion contract, enforced LOUDLY: a start
        // behind retention would silently skip vacuumed deltas, and a
        // start INSIDE a compacted segment would double-serve the
        // segment's earlier versions (a segment replays whole)
        require(v >= units.head.lo,
          s"startingVersion $v predates the oldest retained feed version ${units.head.lo} " +
            s"of $tableName — bootstrap from the snapshot table instead")
        units.find(u => v >= u.lo && v <= u.hi) match {
          case Some(u) if u.lo != v => throw new IllegalArgumentException(
            s"startingVersion $v is inside compacted segment [${u.lo},${u.hi}] of " +
              s"$tableName — a segment is the atomic replay unit; start at ${u.lo}, " +
              "or read the history as a batch with a _commit_version filter")
          case _ => ()
        }
        CdcFeedOffset(v - 1)
      case None => startingTimestampMillis match {
        case Some(ts) =>
          // the tail starts at the first version COMMITTED at or after
          // `ts` (the feed commit marker's own mtime — the same clock
          // _commit_timestamp serves). Resolved over the SINGLE versions
          // (compacted segments have no markers and replay whole — a ts
          // inside compacted history must bootstrap). The same retention
          // contract as startingVersion, both ways loud: a ts behind the
          // oldest resolvable commit would silently skip deltas, and a
          // ts after the newest commit names history that doesn't exist
          // yet (Delta parity — never an implicit "start at latest").
          val singles = units.collect { case CdcFeedScan.SingleVersion(v) => v }
          val times = singles.map(v =>
            v -> Cdc.feedCommitTime(SparkSession.active, d.feedPath, v))
          require(times.nonEmpty && ts >= times.head._2,
            s"startingTimestamp $ts ms predates the oldest retained single feed commit " +
              s"of $tableName (older history is vacuumed or compacted) — " +
              "bootstrap from the snapshot table instead")
          times.find(_._2 >= ts) match {
            case Some((v, _)) => CdcFeedOffset(v - 1)
            case None => throw new IllegalArgumentException(
              s"startingTimestamp $ts ms is after the newest feed commit " +
                s"(v=${times.last._1} @ ${times.last._2} ms) of $tableName")
          }
        case None => CdcFeedOffset(units.head.lo - 1) // oldest retained version
      }
    }
  }

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    maxVersionsPerTrigger
      .map(n => org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(n.toLong))
      .getOrElse(org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (admission control)")

  override def latestOffset(
      start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val from = start.asInstanceOf[CdcFeedOffset].v
    // offsets only ever land on UNIT boundaries: a compacted segment is
    // atomic (its rows can't be split across micro-batches), so admission
    // control counts versions but always takes whole units — a segment
    // larger than the cap still ships as one batch when it's next
    val avail = CdcFeedScan.retainedUnits(d.feedPath)
      .filter(_.lo > from)
      .filter(u => availableNowCap.forall(u.hi <= _))
    if (avail.isEmpty) return start
    val cap = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        r.maxRows().min(Int.MaxValue.toLong)
      case _ => Long.MaxValue
    }
    var taken = 0L
    var end = from
    val it = avail.iterator
    var full = false
    while (it.hasNext && !full) {
      val u = it.next()
      // the FIRST unit always ships (progress guarantee, segment atomicity);
      // stop at the first unit that would overflow the cap — never skip one
      if (taken == 0L || taken + u.size <= cap) { taken += u.size; end = u.hi }
      else full = true
    }
    CdcFeedOffset(end)
  }

  override def reportLatestOffset(): Offset = {
    val units = CdcFeedScan.retainedUnits(d.feedPath)
    if (units.isEmpty) null else CdcFeedOffset(units.last.hi)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[CdcFeedOffset].v
    val to = end.asInstanceOf[CdcFeedOffset].v
    if (to <= from) return Array.empty
    val wanted = CdcFeedScan.retainedUnits(d.feedPath)
      .filter(u => u.lo > from && u.hi <= to)
    // retention law (Cdc.readFeedSince): versions are consecutive, so a
    // hole at the front means vacuum outran this consumer's checkpoint —
    // or compaction folded the resume point into a segment (offsets land
    // on unit boundaries, so a checkpoint can only end up inside a
    // segment when compaction ran PAST it; same contract, same loudness)
    if (wanted.isEmpty || wanted.head.lo > from + 1)
      throw new IllegalStateException(
        s"feed retention exceeded for $tableName: resume point v=$from needs " +
          s"v=${from + 1} but the oldest retained feed unit starts at " +
          s"${wanted.headOption.fold("<none>")(u => s"v=${u.lo}")} " +
          "(vacuumed, or compacted past the checkpoint); " +
          "bootstrap from the snapshot table instead")
    wanted.flatMap(u => CdcFeedScan.unitPartitions(d.feedPath, u)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory(requiredSchema)

  override def deserializeOffset(json: String): Offset = CdcFeedOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class CdcFeedOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}
