package graft.sources.cdc

import java.util.OptionalLong

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.sources.{EqualNullSafe, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

/** Column-pruning, bucket-pruning scan over a CDC store's directories.
  *
  * Scale shape: planning is nBuckets-bounded driver metadata (the
  * manifest's bucket → dir map came with the table; one LIST per
  * non-empty bucket resolves files). Each input partition is ONE bucket
  * carrying `HasPartitionKey` = its bucket id, and the scan reports
  * `KeyGroupedPartitioning(bucket(n, keys), n)` — together these are
  * what lets Spark prove two store scans co-partitioned and plan their
  * join with no Exchange (storage-partitioned join). An unfiltered scan
  * emits every bucket 0..n-1, empty ones included, so both sides of a
  * join always expose identical partition-key sets.
  *
  * Pushdown, both kinds:
  *  - COLUMNS ride `parquet.read.schema` — only requested columns are
  *    materialized. The projection is clipped per file against the
  *    file's own schema, so buckets carried by reference across an
  *    ADDITIVE schema evolution serve typed NULLs for columns their
  *    files predate (the same contract as
  *    [[graft.operators.Cdc.servingLayout]]'s DataFrame readers).
  *  - FILTERS that pin the merge key prune BUCKETS: an `=` conjunct on
  *    every key (or a bounded `IN` panel on a single-key store) hashes
  *    its literals through the store's own bucket function driver-side
  *    and the scan plans ONLY those buckets' partitions — the catalog
  *    twin of [[graft.operators.Cdc.lookupKeys]]'s pruned point reads.
  *    Spark re-evaluates every pushed filter on the returned rows, so
  *    pruning is layout advice, never a correctness dependency.
  *
  * The scan also reports its size ([[SupportsReportStatistics]]: the
  * pruned file bytes), so join planning sees real sizes — a
  * dimension-sized store broadcasts, store-scale sides keep the SPJ
  * shape. */
class CdcScanBuilder(table: CdcStoreTable, d: CdcCatalog.StoreDef)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private var required: StructType = table.schema()
  private var pushed: Array[Filter] = Array.empty
  private var prunedBuckets: Option[Set[Int]] = None
  private var pushedLimit: Option[Int] = None
  private var pushedAggs: Option[Seq[CdcStatsScan.FooterAgg]] = None
  // every predicate Spark hands us, kept verbatim for the reader: the
  // parquet-convertible subset (Spark's own ParquetFilters decides, per
  // file) prunes row groups/pages on ANY column — the same stats
  // pushdown Spark's built-in parquet source does. Purely IO advice in
  // the columnar path (no record assembly); Spark re-evaluates every
  // one of these as residuals.
  private var dataFilters: Array[Filter] = Array.empty
  // per-key literal panels, kept even when they don't pin every key: a
  // single key's panel can't prune BUCKETS on a composite store, but it
  // still skips ROW GROUPS inside every bucket (sorted files carry tight
  // key statistics; the reader pushes the panel into parquet's filter)
  private var keyPanels: Map[String, Seq[Any]] = Map.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve payload field order; an empty projection (count(*)) keeps
    // zero fields and the reader just counts rows. The `_bucket`
    // METADATA column (SupportsMetadataColumns) appends last when the
    // query names it — served as a per-partition constant, never read
    // from files.
    required = StructType((table.schema().fields ++
      table.metadataColumns().map(m => StructField(
        m.name, m.dataType, m.isNullable))).filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    import CdcScan.MaxInPanel
    val keyTypes = d.keys.map(k => table.schema()(k).dataType)
    def bucketOf(values: Seq[Any]): Int =
      CdcScan.bucketOfLiterals(values.zip(keyTypes), d.nBuckets)
    // per-key literal value panel from `=` / null-safe `=` / IN
    // (several conjuncts on one key → the tightest panel wins)
    val panels: Map[String, Seq[Any]] = filters.toSeq.collect {
      case EqualTo(a, v) if d.keys.contains(a) && v != null       => a -> Seq(v)
      case EqualNullSafe(a, v) if d.keys.contains(a) && v != null => a -> Seq(v)
      case In(a, vs) if d.keys.contains(a) && vs.nonEmpty &&
        vs.length <= MaxInPanel && !vs.contains(null)             => a -> vs.toSeq
    }.groupBy(_._1).map { case (k, ps) => k -> ps.map(_._2).minBy(_.length) }
    keyPanels = panels
    dataFilters = filters
    if (d.keys.forall(panels.contains)) {
      // cross product of per-key panels (bounded: singletons except IN)
      val combos = d.keys.foldLeft(Seq(Seq.empty[Any])) { (acc, k) =>
        acc.flatMap(prefix => panels(k).map(v => prefix :+ v))
      }
      if (combos.length <= MaxInPanel) {
        prunedBuckets = Some(combos.map(bucketOf).toSet)
        pushed = filters.filter {
          case EqualTo(a, _) => d.keys.contains(a)
          case EqualNullSafe(a, _) => d.keys.contains(a)
          case In(a, _) => d.keys.contains(a)
          case _ => false
        }
      }
    }
    filters // Spark re-evaluates everything; pruning is layout advice
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** LIMIT pushdown as PARTITION-COUNT pruning: an unfiltered
    * `LIMIT n` needs any n rows, and the manifest already knows each
    * bucket's row count — so the scan plans only enough buckets to cover
    * n instead of one task per bucket (a `LIMIT 10` over a 1024-bucket
    * store schedules 1 partition, not 1024). PARTIAL pushdown
    * (`isPartiallyPushed = true`): Spark keeps its own LocalLimit /
    * GlobalLimit, so the scan only ever has to over-deliver, never
    * under-deliver — which is why any data filter disqualifies (a
    * residual filter could thin a planned bucket below n; bucket-pruning
    * key panels are fine: Spark re-checks them but they hold by
    * construction, so planned buckets contain exactly the matching
    * keys' rows... conservatively we still require NO filters at all —
    * pruning decisions must never depend on a panel being exact). */
  override def pushLimit(limit: Int): Boolean = {
    val clean = limit > 0 && dataFilters.isEmpty && keyPanels.isEmpty &&
      prunedBuckets.isEmpty &&
      // pending merge-on-read deltas: resolved bucket counts are unknown
      // (and a delta-only bucket isn't even in bucketDirs), so the
      // count-covering prefix can't be proven — plan every bucket.
      // Lazily-split children likewise: a child's slice has no count of
      // its own, so an explicit guard (belt to the row-count braces —
      // any recorded count for a sliced child would be wrong, not just
      // absent) keeps LIMIT planning off split stores until rewrite.
      table.bucketDeltaDirs.isEmpty && table.slicedBuckets.isEmpty &&
      table.bucketDirs.keySet.forall(table.bucketRows.contains)
    if (clean) pushedLimit = Some(limit)
    clean
  }

  override def isPartiallyPushed(): Boolean = true

  /** METADATA-ONLY aggregates, two tiers (PARTIAL pushdown both —
    * `supportCompletePushDown = false` — so the scan emits partial rows
    * and Spark's final aggregate merges them; the standard V2 contract,
    * AQE-safe):
    *
    *  - COUNT(*) / COUNT(merge key): the manifest already records every
    *    bucket's row count ([[graft.operators.Cdc
    *    .processPartitionedBatch]]), so these answer from
    *    nBuckets-bounded driver metadata with ZERO file IO
    *    ([[CdcCountScan]]) when every bucket carries a recorded count.
    *  - MIN / MAX / COUNT(nullable col): answered from parquet FOOTER
    *    statistics ([[CdcStatsScan]]) — per-bucket partitions fold
    *    row-group min/max/null-counts executor-side, no page decode.
    *
    * Guarded hard: no grouping, every aggregate expression must be a
    * supported shape (any mix of COUNT(*) / COUNT(col) / MIN / MAX over
    * supported-type top-level columns — DISTINCT and SUM refuse: footers
    * carry neither), and no pushed/residual filters (Spark only attempts
    * aggregate pushdown when no filter survives between the aggregate
    * and the scan; we additionally require no panels). */
  override def supportCompletePushDown(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    false

  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (!CdcStatsScan.enabled) return false
    if (pushed.nonEmpty || keyPanels.nonEmpty || prunedBuckets.nonEmpty) return false
    // pending merge-on-read deltas: footer statistics and manifest counts
    // describe PRE-FOLD rows (tombstones included) — folding aggregates
    // from metadata would double-count updated keys and count deletes.
    // Lazily-split children: footer stats describe the PARENT's files
    // (shared by siblings — double-counted, unsliced). Refuse both;
    // compaction restores pushdown.
    if (table.bucketDeltaDirs.nonEmpty || table.slicedBuckets.nonEmpty) return false
    // merge keys are non-null by the store's contract: COUNT(key) needs
    // no null statistics, only row counts
    pushedAggs = CdcStatsScan.parseAggregation(
      aggregation, table.schema(), excluded = Set.empty, nonNullCols = d.keys.toSet,
      trustStringStats = d.trustStringStats)
    pushedAggs.isDefined
  }

  override def build(): Scan = {
    pushedAggs match {
      case Some(aggs) =>
        // counts-only over complete manifest counts: zero file IO
        val metadataOnly = aggs.forall {
          case CdcStatsScan.FCountStar => true
          case CdcStatsScan.FCount(_, nonNull, _) => nonNull
          case _ => false
        } && table.bucketDirs.keySet.forall(table.bucketRows.contains)
        if (metadataOnly)
          return new CdcCountScan(table.name(),
            table.bucketDirs.keySet.iterator.map(table.bucketRows).sum, aggs)
        // otherwise: fold footer statistics, one partition per bucket —
        // against the files' PHYSICAL column names (schemaFor's output
        // names are cosmetic; Spark matches pushed aggregates by position)
        val phys = (c: String) => table.physMap.getOrElse(c, c)
        val physAggs = aggs.map {
          case CdcStatsScan.FMin(c, dt)       => CdcStatsScan.FMin(phys(c), dt)
          case CdcStatsScan.FMax(c, dt)       => CdcStatsScan.FMax(phys(c), dt)
          case CdcStatsScan.FCount(c, nn, dt) => CdcStatsScan.FCount(phys(c), nn, dt)
          case CdcStatsScan.FCountStar        => CdcStatsScan.FCountStar
        }
        val statFiles: Map[Int, Array[String]] = table.bucketDirs.map { case (b, dir) =>
          b -> CdcFeedScan.dirFiles(dir).toArray
        }
        return new CdcStatsScan(table.name(), physAggs, statFiles)
      case None => ()
    }
    // a pushed LIMIT plans only enough non-empty buckets to cover n rows
    // (pushLimit requires complete manifest counts and no filters/panels)
    val limitBuckets: Option[Set[Int]] = pushedLimit.map { n =>
      var acc = 0L
      (0 until d.nBuckets).iterator
        .filter(b => table.bucketRows.getOrElse(b, 0L) > 0)
        .takeWhile { b => val need = acc < n; acc += table.bucketRows(b); need }
        .toSet
    }
    // resolve each surviving bucket's file list now, on the driver
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    def listDir(dir: String): Array[(String, Long)] = {
      val p = new Path(dir)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Array.empty
      else fs.listStatus(p)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => s.getPath.toString -> s.getLen)
        .sortBy(_._1)
    }
    def planned(b: Int): Boolean =
      prunedBuckets.forall(_.contains(b)) && limitBuckets.forall(_.contains(b))
    val files: Map[Int, Array[(String, Long)]] = table.bucketDirs
      .filter { case (b, _) => planned(b) }
      .map { case (b, dir) => b -> listDir(dir) }
    // merge-on-read delta levels, per planned bucket, manifest order
    val deltaFiles: Map[Int, Array[Array[(String, Long)]]] = table.bucketDeltaDirs
      .filter { case (b, _) => planned(b) }
      .map { case (b, dirs) => b -> dirs.map(listDir).toArray }
    val buckets = limitBuckets.map(_.toSeq.sorted)
      .orElse(prunedBuckets.map(_.toSeq.sorted))
      .getOrElse(0 until d.nBuckets)
    new CdcScan(table.name(), required, d.keys,
      d.keys.map(k => table.schema()(k).dataType), d.nBuckets, buckets, files, keyPanels,
      table.bucketRows, dataFilters, table.bucketColStats, table.physMap, deltaFiles,
      table.slicedBuckets)
  }
}

/** The pushed-COUNT scan: one partition, one row carrying the
  * manifest's total (once per pushed count expression — COUNT(*) and
  * COUNT(merge key) both count every row, keys being non-null) — ZERO
  * file IO. Spark's final aggregate sums the partials (here: the one
  * row), so the plan stays an ordinary aggregate whose input just
  * happens to be metadata. The schema names each field after ITS
  * expression (`count(*)` / `count(<col>)`) — Spark matches pushed
  * aggregate output positionally, but distinct names keep the
  * multi-expression shape debuggable and the schema well-formed. */
class CdcCountScan(tableName: String, totalRows: Long, aggs: Seq[CdcStatsScan.FooterAgg])
    extends Scan with Batch {
  override def readSchema(): StructType = CdcStatsScan.schemaFor(aggs)
  override def toBatch: Batch = this
  override def description(): String = s"$tableName metadata count=$totalRows (no file IO)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(CdcCountPartition(totalRows, aggs.length))
  override def createReaderFactory(): PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] =
      new PartitionReader[InternalRow] {
        private val cp = p.asInstanceOf[CdcCountPartition]
        private var served = false
        override def next(): Boolean = if (served) false else { served = true; true }
        override def get(): InternalRow = InternalRow.fromSeq(Seq.fill(cp.n)(cp.rows))
        override def close(): Unit = ()
      }
  }
}

case class CdcCountPartition(rows: Long, n: Int = 1) extends InputPartition

object CdcScan {
  /** Rewrite a v1 source Filter's attribute references from LOGICAL to
    * PHYSICAL names for the file-side readers. Only called when a column
    * mapping exists; shapes we can't rebuild are DROPPED — these filters
    * are row-group IO advice (Spark re-evaluates every residual), and an
    * untranslated logical name can ALIAS another column's physical
    * spelling after a rename + re-add, which would prune row groups
    * against the wrong column's statistics and silently lose rows. */
  private[cdc] def translateFilter(
      f: org.apache.spark.sql.sources.Filter,
      phys: Map[String, String]): Option[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources._
    def p(a: String): String = phys.getOrElse(a, a)
    f match {
      case EqualTo(a, v)            => Some(EqualTo(p(a), v))
      case EqualNullSafe(a, v)      => Some(EqualNullSafe(p(a), v))
      case GreaterThan(a, v)        => Some(GreaterThan(p(a), v))
      case GreaterThanOrEqual(a, v) => Some(GreaterThanOrEqual(p(a), v))
      case LessThan(a, v)           => Some(LessThan(p(a), v))
      case LessThanOrEqual(a, v)    => Some(LessThanOrEqual(p(a), v))
      case In(a, vs)                => Some(In(p(a), vs))
      case IsNull(a)                => Some(IsNull(p(a)))
      case IsNotNull(a)             => Some(IsNotNull(p(a)))
      case StringStartsWith(a, v)   => Some(StringStartsWith(p(a), v))
      case StringEndsWith(a, v)     => Some(StringEndsWith(p(a), v))
      case StringContains(a, v)     => Some(StringContains(p(a), v))
      // composites translate EXACTLY or drop WHOLE: weakening an AND to
      // one side would be safe alone, but the same weakened child under a
      // NOT (or an OR) narrows the predicate — unsafe for pruning. A
      // dropped top-level conjunct only costs row-group advice.
      case And(l, r) =>
        for (a <- translateFilter(l, phys); b <- translateFilter(r, phys)) yield And(a, b)
      case Or(l, r) =>
        for (a <- translateFilter(l, phys); b <- translateFilter(r, phys)) yield Or(a, b)
      case Not(c) =>
        translateFilter(c, phys).map(Not)
      case AlwaysTrue()  => Some(AlwaysTrue())
      case AlwaysFalse() => Some(AlwaysFalse())
      case _ => None
    }
  }

  /** Bounded IN panels only: a million-value IN is a join in disguise —
    * the driver must not hash data-sized literal lists. */
  private[cdc] val MaxInPanel = 1024

  /** The store's layout hash over literal key values, driver-side — the
    * same `pmod(xxhash64(keys), n)` as [[graft.operators.Cdc.bucketExpr]],
    * evaluated through Catalyst's own XxHash64. Accepts both EXTERNAL
    * literals (v1 Filter pushdown: String, java.sql.Date) and INTERNAL
    * ones (V2 runtime predicates: UTF8String, epoch-day Int). */
  private[cdc] def bucketOfLiterals(values: Seq[(Any, DataType)], n: Int): Int = {
    val lits = values.map {
      case (u: UTF8String, t)                       => Literal(u, t)
      case (i: Integer, t) if t == DateType         => Literal(i, t)
      case (v, t)                                   => Literal.create(v, t)
    }
    val h = XxHash64(lits, 42L).eval(null).asInstanceOf[Long]
    val m = h % n
    (if (m < 0) m + n else m).toInt
  }

  /** Parse V2 predicate conjuncts into the bounded EXTERNAL key tuples
    * they pin: every conjunct must be `=` / bounded `IN` on a merge key
    * (nested ANDs are flattened), every key must end up pinned, and the
    * panel product stays under [[MaxInPanel]]. `None` on any miss — the
    * caller must refuse rather than widen the predicate's meaning
    * (DELETE WHERE k=5 AND bal>10 must never become DELETE WHERE k=5). */
  private[cdc] def pinnedKeyTuples(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate],
      keys: Seq[String],
      schema: StructType): Option[Seq[Seq[Any]]] = {
    import org.apache.spark.sql.connector.expressions.{Literal => V2Literal, NamedReference}
    def keyOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] = e match {
      case r: NamedReference if keys.contains(r.fieldNames.mkString(".")) =>
        Some(r.fieldNames.mkString("."))
      case _ => None
    }
    def external(v: Any, k: String): Any =
      org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToScala(v, schema(k).dataType)
    // each conjunct → (key, values) or None (unpinnable)
    def panelOf(p: org.apache.spark.sql.connector.expressions.filter.Predicate)
        : Option[Seq[(String, Set[Any])]] = {
      val kids = p.children()
      p.name() match {
        case "AND" =>
          val parts = kids.toSeq.map {
            case c: org.apache.spark.sql.connector.expressions.filter.Predicate => panelOf(c)
            case _ => None
          }
          if (parts.forall(_.isDefined)) Some(parts.flatMap(_.get)) else None
        case "=" if kids.length == 2 && kids(1).isInstanceOf[V2Literal[_]] =>
          keyOf(kids(0)).map(k => Seq(k -> Set(external(kids(1).asInstanceOf[V2Literal[_]].value, k))))
        case "IN" if kids.length >= 2 && kids.length - 1 <= MaxInPanel &&
            kids.tail.forall(_.isInstanceOf[V2Literal[_]]) =>
          keyOf(kids.head).map(k =>
            Seq(k -> kids.tail.map(c => external(c.asInstanceOf[V2Literal[_]].value, k)).toSet))
        case _ => None
      }
    }
    val conjuncts = predicates.toSeq.map(panelOf)
    if (conjuncts.exists(_.isEmpty)) return None
    // NULL literals drop out: SQL = / IN never match NULL, so they pin
    // nothing (an empty panel means the predicate matches no row at all)
    val byKey = conjuncts.flatMap(_.get)
      .groupBy(_._1).view.mapValues(_.map(_._2).reduce(_ intersect _).filter(_ != null)).toMap
    if (!keys.forall(byKey.contains)) return None
    val tuples = keys.map(k => byKey(k).toSeq)
      .foldLeft(Seq(Seq.empty[Any]))((acc, vs) => acc.flatMap(t => vs.map(v => t :+ v)))
    if (tuples.size > MaxInPanel) None else Some(tuples)
  }
}

class CdcScan(
    tableName: String,
    requiredSchema: StructType,
    keys: Seq[String],
    keyTypes: Seq[DataType],
    nBuckets: Int,
    buckets: Seq[Int],
    filesByBucket: Map[Int, Array[(String, Long)]],
    staticPanels: Map[String, Seq[Any]] = Map.empty,
    rowsByBucket: Map[Int, Long] = Map.empty,
    dataFilters: Array[Filter] = Array.empty,
    colStatsByBucket: Map[Int, Map[String, graft.operators.Cdc.ColStatRec]] = Map.empty,
    physMap: Map[String, String] = Map.empty,
    deltaFilesByBucket: Map[Int, Array[Array[(String, Long)]]] = Map.empty,
    /** Lazily-split children ([[graft.operators.Cdc.splitBuckets]]):
      * their file lists are the PARENT's files, and the reader must
      * slice rows to the partition's own bucket id with the layout
      * hash — one more reason (besides deltas) a partition takes the
      * row-path reader. */
    slicedBuckets: Set[Int] = Set.empty)
    extends Scan with Batch
    with SupportsReportPartitioning with SupportsReportStatistics
    with SupportsRuntimeV2Filtering {

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"$tableName buckets=${buckets.length}/$nBuckets cols=${requiredSchema.fieldNames.mkString(",")}"

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.bucket(nBuckets, keys: _*)), buckets.length)

  // RUNTIME bucket pruning (the V2 DPP contract): when this scan joins a
  // filterable side on merge keys, Spark executes that side first,
  // collects its distinct key values, and hands them here as =/IN
  // predicates PER KEY — hashing them through the layout function drops
  // whole buckets BEFORE any store file is opened. Buckets prune when the
  // runtime panels pin EVERY key (single-key stores: one panel; composite
  // stores: the bounded cross-product of the per-key panels — the same
  // superset construction as the static path, so a bucket is dropped only
  // if NO combination of per-key values hashes into it). Keys with a
  // panel but not full coverage still contribute per-key ROW-GROUP
  // filtering through readerPanels.
  @volatile private var runtimeBuckets: Option[Set[Int]] = None
  @volatile private var runtimePanels: Map[String, Set[Any]] = Map.empty
  private[cdc] def runtimePrunedBuckets: Option[Set[Int]] = runtimeBuckets

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    keys.filter(requiredSchema.fieldNames.contains).map(Expressions.column).toArray

  override def filter(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    import org.apache.spark.sql.connector.expressions.{Literal => V2Literal, NamedReference}
    def keyOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] = e match {
      case r: NamedReference if keys.contains(r.fieldNames.mkString(".")) =>
        Some(r.fieldNames.mkString("."))
      case _ => None
    }
    val panels: Seq[(String, Set[Any])] = predicates.toSeq.flatMap { p =>
      val kids = p.children()
      p.name() match {
        case "IN" if kids.length >= 2 && kids.length - 1 <= CdcScan.MaxInPanel &&
            kids.tail.forall(_.isInstanceOf[V2Literal[_]]) =>
          keyOf(kids.head).map(k =>
            k -> kids.tail.map(_.asInstanceOf[V2Literal[_]].value.asInstanceOf[Any]).toSet)
        case "=" if kids.length == 2 && kids(1).isInstanceOf[V2Literal[_]] =>
          keyOf(kids(0)).map(k =>
            k -> Set(kids(1).asInstanceOf[V2Literal[_]].value.asInstanceOf[Any]))
        case _ => None
      }
    }
    if (panels.nonEmpty) {
      // several panels on one key intersect (each is a superset of the
      // key's true value set, so the intersection still is)
      val byKey = panels.groupBy(_._1).view
        .mapValues(_.map(_._2).reduce(_ intersect _).filter(_ != null)).toMap
      runtimePanels = byKey
      if (keys.forall(byKey.contains)) {
        // bounded cross-product of per-key panels → the bucket superset,
        // exactly the static pushFilters construction. Over the cap the
        // product is a join in disguise: keep row-group panels, skip
        // bucket pruning.
        val combos = keys.foldLeft(Seq(Seq.empty[Any])) { (acc, k) =>
          acc.flatMap(prefix => byKey(k).toSeq.map(v => prefix :+ v))
        }
        if (combos.length <= CdcScan.MaxInPanel)
          runtimeBuckets = Some(combos.map(c =>
            CdcScan.bucketOfLiterals(c.zip(keyTypes), nBuckets)).toSet)
      }
    }
  }

  /** Per-key panels the READER pushes into parquet (AND of bounded INs):
    * row groups whose key statistics exclude every panel value never
    * decode — the sub-bucket half of point reads over the store's
    * key-sorted files. Values normalize to external scala types here so
    * one reader-side encoding serves both the v1 pushdown literals and
    * the runtime (internal) panel. */
  private def readerPanels: Array[(String, Array[Any])] = {
    def norm(v: Any): Any = v match {
      case u: UTF8String => u.toString
      case other         => other
    }
    val runtime = runtimePanels.view.mapValues(_.toSeq).toMap
    (staticPanels.keySet ++ runtime.keySet).iterator.map { k =>
      val s = staticPanels.get(k).map(_.map(norm).toSet)
      val r = runtime.get(k).map(_.map(norm).toSet)
      val merged: Set[Any] = (s, r) match {
        case (Some(a), Some(b)) => a intersect b
        case (a, b)             => a.orElse(b).get
      }
      k -> merged.toArray
    }.filter { case (k, vs) =>
      vs.nonEmpty && (requiredSchema.fields.find(_.name == k).map(_.dataType) match {
        case Some(LongType) | Some(IntegerType) | Some(StringType) => true
        case Some(_) => false
        case None    => false // key projected out: stats pruning forfeited
      })
    }.toArray
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // readers touch FILES: key-panel filters AND pushed source filters
    // are spelled in the files' PHYSICAL names (renames never rewrote
    // them) — an untranslated logical name could alias another column's
    // physical spelling and prune against the wrong statistics
    val panels = readerPanels.map { case (k, vs) => physMap.getOrElse(k, k) -> vs }
    val physFilters =
      if (physMap.isEmpty) dataFilters
      else dataFilters.flatMap(CdcScan.translateFilter(_, physMap))
    val physKeys = keys.map(k => physMap.getOrElse(k, k)).toArray
    buckets
      .filter(b => runtimeBuckets.forall(_.contains(b)))
      .map { b =>
        val deltas = deltaFilesByBucket.getOrElse(b, Array.empty)
          .map(_.map(_._1))
        val sliced = slicedBuckets.contains(b)
        val rowPath = deltas.nonEmpty || sliced
        CdcBucketPartition(b, filesByBucket.getOrElse(b, Array.empty).map(_._1), panels,
          // a delta'd partition FOLDS: row-group/record pruning by
          // arbitrary payload predicates could drop a key's newest delta
          // row while keeping its base row — resurrecting the stale
          // version — so pushed data filters stay OFF the fold path
          // (key-equality panels remain safe: they drop a key's rows on
          // every level together). Sliced partitions drop them too (the
          // row-path reader record-filters; residuals re-check above).
          if (rowPath) Array.empty[Filter] else physFilters,
          deltaLevels = deltas,
          morKeys = if (rowPath) physKeys else Array.empty,
          morKeyTypes = if (rowPath) keyTypes.toArray else Array.empty,
          sliceN = if (sliced) nBuckets else 0)
      }.toArray[InputPartition]
  }

  // Pruning observability (Spark UI / SQLAppStatusStore): how many
  // buckets each pruning tier dropped, and how many files survive —
  // read off the executed plan, not inferred from task counts.
  override def supportedCustomMetrics():
      Array[org.apache.spark.sql.connector.metric.CustomMetric] = CdcMetrics.scanMetrics

  override def reportDriverMetrics():
      Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] = {
    val planned = buckets.filter(b => runtimeBuckets.forall(_.contains(b)))
    Array(
      CdcMetrics.Value("plannedBuckets", planned.length.toLong),
      CdcMetrics.Value("staticPrunedBuckets", (nBuckets - buckets.length).toLong),
      CdcMetrics.Value("runtimePrunedBuckets", (buckets.length - planned.length).toLong),
      CdcMetrics.Value("plannedFiles",
        planned.iterator.map(b => filesByBucket.getOrElse(b, Array.empty).length.toLong).sum))
  }

  /** Real sizes for the planner: the PRUNED byte count, so a
    * dimension-sized (or heavily pruned) store side can broadcast while
    * store-scale sides keep the exchange-free SPJ shape. Row counts come
    * from the manifest (recorded per bucket at commit) and sum over the
    * PLANNED buckets only — reported only when every planned non-empty
    * bucket has one (a partial sum would misstate the table). Keys are
    * unique per row, so a single-key store also reports key NDV =
    * numRows (composite stores skip per-column NDV: a component column's
    * own NDV is ≤ numRows and unknown).
    *
    * Per-column MIN/MAX/NULLCOUNT fold from the manifest-recorded footer
    * statistics over the same planned-bucket set (min of mins, max of
    * maxes, sum of nulls — reported only when every planned non-empty
    * bucket carries the column, else the estimate would silently
    * misstate the pruned table). This is what lets the CBO estimate
    * FILTER SELECTIVITY on store columns — a selective range predicate
    * shrinks the estimated rows enough to flip a join's build side,
    * exactly like ANALYZE's column stats on warehouse tables. */
  override def estimateStatistics(): Statistics = {
    // distinct by PATH: lazily-split sibling children share their parent's
    // files — counting a shared file once per serving child would
    // overstate sizeInBytes by up to the split factor and flip broadcast
    // decisions until the children rewrite
    val bytes = filesByBucket.valuesIterator.flatten.toSeq.distinctBy(_._1).map(_._2).sum +
      deltaFilesByBucket.valuesIterator.flatten.flatten.map(_._2).sum
    // a bucket counts as non-empty when it has base files OR pending
    // deltas (a delta'd bucket's resolved count is unknown — its absence
    // from rowsByBucket must make numRows honest, never a phantom 0)
    val nonEmpty = buckets.filter(b => filesByBucket.getOrElse(b, Array.empty).nonEmpty ||
      deltaFilesByBucket.getOrElse(b, Array.empty).exists(_.nonEmpty))
    val known = nonEmpty.forall(rowsByBucket.contains)
    val rows =
      if (known) OptionalLong.of(buckets.iterator.map(rowsByBucket.getOrElse(_, 0L)).sum)
      else OptionalLong.empty()
    // internal-value parse of the manifest's stringified footer min/max
    def parse(s: String, dt: DataType): Object = dt match {
      case LongType               => java.lang.Long.valueOf(s)
      case IntegerType | DateType => java.lang.Integer.valueOf(s)
      case DoubleType             => java.lang.Double.valueOf(s)
      case FloatType              => java.lang.Float.valueOf(s)
      case BooleanType            => java.lang.Boolean.valueOf(s)
      case t => throw new IllegalStateException(s"unexpected CBO min/max type $t")
    }
    def ordered(dt: DataType): Ordering[Object] = {
      val o: Ordering[_] = dt match {
        case LongType               => Ordering.Long
        case IntegerType | DateType => Ordering.Int
        case DoubleType             => Ordering.Double.TotalOrdering
        case FloatType              => Ordering.Float.TotalOrdering
        case BooleanType            => Ordering.Boolean
        case t => throw new IllegalStateException(s"unexpected CBO min/max type $t")
      }
      o.asInstanceOf[Ordering[Object]]
    }
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
      override def numRows(): OptionalLong = rows
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
        val m = new java.util.HashMap[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
        val keyNdv = rows.isPresent && keys.length == 1
        for (f <- requiredSchema.fields) {
          // manifest colstats are keyed by PHYSICAL name (stable across
          // renames, so carried stats survive them)
          val perBucket = nonEmpty.map(b =>
            colStatsByBucket.getOrElse(b, Map.empty).get(physMap.getOrElse(f.name, f.name)))
          val complete = perBucket.nonEmpty && perBucket.forall(_.isDefined)
          val recs = perBucket.flatten
          val nulls: OptionalLong =
            if (complete) OptionalLong.of(recs.iterator.map(_.nulls).sum)
            else if (keyNdv && f.name == keys.head) OptionalLong.of(0L)
            else OptionalLong.empty()
          // min/max only when every bucket carries a range OR is all-NULL
          // for the column (nulls == that bucket's rows would need rows
          // per bucket; absence of min with nulls recorded means all-NULL)
          val ranged = complete && recs.exists(_.min.isDefined) &&
            recs.forall(r => r.min.isDefined == r.max.isDefined)
          val (mn, mx): (java.util.Optional[Object], java.util.Optional[Object]) =
            if (!ranged) (java.util.Optional.empty(), java.util.Optional.empty())
            else {
              implicit val o: Ordering[Object] = ordered(f.dataType)
              val mins = recs.flatMap(_.min).map(parse(_, f.dataType))
              val maxs = recs.flatMap(_.max).map(parse(_, f.dataType))
              (java.util.Optional.of(mins.min), java.util.Optional.of(maxs.max))
            }
          // key NDV = numRows (unique by contract, exact); other columns
          // sum the per-bucket HLL estimates — an upper bound (values
          // repeat across buckets), clamped by non-null rows when known
          val ndv: OptionalLong =
            if (keyNdv && f.name == keys.head) rows
            else if (complete && recs.forall(_.ndv.isDefined)) {
              val sum = recs.iterator.map(_.ndv.get).sum
              // clamp by non-null rows when known; an all-NULL column
              // honestly reports NDV 0, never a phantom 1
              val clamped =
                if (rows.isPresent && nulls.isPresent)
                  math.min(sum, math.max(0L, rows.getAsLong - nulls.getAsLong))
                else sum
              OptionalLong.of(clamped)
            } else OptionalLong.empty()
          if (nulls.isPresent || mn.isPresent || ndv.isPresent)
            m.put(Expressions.column(f.name),
              new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
                override def distinctCount(): OptionalLong = ndv
                override def nullCount(): OptionalLong = nulls
                override def min(): java.util.Optional[Object] = mn
                override def max(): java.util.Optional[Object] = mx
              })
        }
        m
      }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // the reader decodes files by NAME: hand it the physical spelling of
    // every payload column, SAME positions — Spark consumes the batch
    // positionally against readSchema(), so the logical names stay the
    // plan's and the physical names stay the files'
    val fileSchema = StructType(requiredSchema.fields.map(f =>
      f.copy(name = physMap.getOrElse(f.name, f.name))))
    // Spark refuses MIXED row/columnar partitions in one scan, so any
    // pending delta level (fold) or lazily-split child (slice) anywhere
    // drops the WHOLE scan to the row path; compaction restores the
    // vectorized serve shape
    new CdcReaderFactory(fileSchema,
      columnar = CdcReaderFactory.columnarEnabled && deltaFilesByBucket.isEmpty &&
        slicedBuckets.isEmpty)
  }
}

case class CdcBucketPartition(
    bucket: Int,
    files: Array[String],
    keyFilters: Array[(String, Array[Any])] = Array.empty,
    sourceFilters: Array[Filter] = Array.empty,
    /** Merge-on-read delta FILE LISTS in manifest (commit) order — when
      * non-empty the reader folds base + deltas last-writer-wins. */
    deltaLevels: Array[Array[String]] = Array.empty,
    /** The merge keys' PHYSICAL column names + types (set when
      * deltaLevels is non-empty or sliceN > 0): the fold's row identity
      * and the slice's hash input, read from the files even when the
      * query projected the keys out. */
    morKeys: Array[String] = Array.empty,
    morKeyTypes: Array[DataType] = Array.empty,
    /** Lazy bucket-split slice: when > 0, `files` are the PARENT's files
      * and only rows with `pmod(xxhash64(keys), sliceN) == bucket`
      * belong to this partition. */
    sliceN: Int = 0)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

object CdcReaderFactory {
  /** Session toggle for the vectorized path (A/B escape hatch; default
    * on). Resolved DRIVER-side when the factory is created, so a plain
    * `spark.conf.set("graft.cdc.columnar", "false")` steers executors. */
  private[cdc] def columnarEnabled: Boolean =
    scala.util.Try(SparkSession.active.conf.get("graft.cdc.columnar"))
      .toOption.forall(_.toBoolean)
}

class CdcReaderFactory(
    requiredSchema: StructType,
    columnar: Boolean = CdcReaderFactory.columnarEnabled)
    extends PartitionReaderFactory {
  // a compacted segment's files carry _commit_timestamp as DATA
  // (materialized at compaction); single-version files serve it as the
  // commit marker's per-partition constant
  private def feedConstants(f: CdcFeedPartition): Map[String, Any] =
    if (f.tsInData) Map.empty else Map("_commit_timestamp" -> f.commitTsMicros)

  // a bootstrap-snapshot slice is ordinary store files plus the full CDF
  // column set as constants: every row an `insert` at the snapshot version
  private def snapshotConstants(s: CdcSnapshotPartition): Map[String, Any] = Map(
    "_change_type" -> UTF8String.fromString("insert"),
    "_commit_version" -> s.commitVersion,
    "_commit_timestamp" -> s.commitTsMicros)

  // the `_bucket` metadata column is the partition's own bucket id
  private def bucketConstants(b: CdcBucketPartition): Map[String, Any] =
    if (requiredSchema.fieldNames.contains("_bucket")) Map("_bucket" -> b.bucket)
    else Map.empty

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case b: CdcBucketPartition if b.deltaLevels.nonEmpty || b.sliceN > 0 =>
        new CdcMorPartitionReader(b.files, b.deltaLevels, requiredSchema,
          b.morKeys, b.morKeyTypes, b.keyFilters, bucketConstants(b),
          slice = if (b.sliceN > 0) Some((b.sliceN, b.bucket)) else None)
      case b: CdcBucketPartition => new CdcPartitionReader(b.files, requiredSchema, b.keyFilters,
        constants = bucketConstants(b))
      case f: CdcFeedPartition   => new CdcPartitionReader(f.files, requiredSchema,
        constants = feedConstants(f))
      case s: CdcSnapshotPartition => new CdcPartitionReader(s.files, requiredSchema,
        constants = snapshotConstants(s))
      case p => throw new IllegalArgumentException(s"not a CDC partition: $p")
    }

  // The serve path is COLUMNAR ([[CdcColumnarReader]]): every supported
  // payload type decodes through Spark's vectorized parquet reader, so
  // the scan feeds whole-stage codegen ColumnarBatches exactly like
  // Spark's built-in parquet source. The row reader above remains the
  // spec-pinned fallback for Spark code paths that ask for rows.
  override def supportColumnarReads(partition: InputPartition): Boolean = columnar
  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] =
    partition match {
      case b: CdcBucketPartition => new CdcColumnarReader(b.files, requiredSchema,
        b.keyFilters, constants = bucketConstants(b), sourceFilters = b.sourceFilters)
      case f: CdcFeedPartition   => new CdcColumnarReader(f.files, requiredSchema,
        constants = feedConstants(f))
      case s: CdcSnapshotPartition => new CdcColumnarReader(s.files, requiredSchema,
        constants = snapshotConstants(s))
      case p => throw new IllegalArgumentException(s"not a CDC partition: $p")
    }
}

/** Streams one bucket's files. Per file: read the footer, clip the
  * requested projection against the file schema (copying the FILE's
  * parquet types so physical layouts always match), push it through
  * `parquet.read.schema`, then decode Groups positionally. Columns the
  * file predates (additive evolution) decode as NULL. */
class CdcPartitionReader(
    files: Array[String],
    requiredSchema: StructType,
    keyFilters: Array[(String, Array[Any])] = Array.empty,
    constants: Map[String, Any] = Map.empty)
    extends PartitionReader[InternalRow] {

  /** Key panels as a parquet filter (AND of per-key OR-of-eq): row groups
    * whose tight key statistics (files are key-sorted at write) exclude
    * every value never decode.
    *
    * CORRECTNESS INVARIANT (this filter is load-bearing in THIS reader):
    * `FilterCompat.get` enables parquet's RECORD-level filtering too, so
    * rows outside the panel are dropped before Spark ever sees them — and
    * Spark's residual re-evaluation cannot restore a dropped row. That is
    * only sound because every per-key panel is a SUPERSET of the values
    * any row matching the pushed predicates can carry (panels derive from
    * =/IN conjuncts via minBy/intersect — never widened, only tightened).
    * Any future panel derivation that loosens this must restrict the
    * filter to row-group stats pruning instead. (The vectorized columnar
    * path has no record assembly, so there the same filter really is
    * row-group/page pruning only.) Only built from columns the projection
    * carries (and the file contains). */
  private def parquetFilter(fileSchema: MessageType): Option[org.apache.parquet.filter2.predicate.FilterPredicate] = {
    import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
    val conjuncts: Seq[FilterPredicate] =
      keyFilters.toSeq.filter(f => fileSchema.containsField(f._1)).flatMap {
      case (name, values) =>
        val eqs: Seq[FilterPredicate] =
          requiredSchema.fields.find(_.name == name).map(_.dataType) match {
          case Some(LongType) =>
            values.toSeq.map(v => FilterApi.eq(
              FilterApi.longColumn(name), java.lang.Long.valueOf(v.asInstanceOf[Number].longValue)))
          case Some(IntegerType) =>
            values.toSeq.map(v => FilterApi.eq(
              FilterApi.intColumn(name), java.lang.Integer.valueOf(v.asInstanceOf[Number].intValue)))
          case Some(StringType) =>
            values.toSeq.map(v => FilterApi.eq(
              FilterApi.binaryColumn(name),
              org.apache.parquet.io.api.Binary.fromString(v.toString)))
          case _ => Nil
        }
        if (eqs.isEmpty) None else Some(eqs.reduce(FilterApi.or(_, _)))
    }
    conjuncts.reduceOption(FilterApi.and(_, _))
  }

  // executor-side: files carry their scheme (file://, hdfs://); a default
  // Configuration resolves the right FileSystem for both
  private val conf = new Configuration()

  private var opened = 0
  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(CdcMetrics.Value("filesOpened", opened.toLong))

  private var fileIdx = -1
  private var reader: ParquetReader[org.apache.parquet.example.data.Group] = _
  // for the current file: required-field index → (group field position | -1 for absent)
  private var fieldPos: Array[Int] = _
  // the FILE's primitive per required field (null when absent): what lets
  // decode up-cast a pre-widening file's INT32/FLOAT into the recorded
  // LONG/DOUBLE (metadata-only type widening — Cdc.widenColumn)
  private var filePrim: Array[org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName] = _
  private var current: InternalRow = _

  private def openNext(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    fileIdx += 1
    if (fileIdx >= files.length) return false
    opened += 1
    val path = new Path(files(fileIdx))
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
    filePrim = requiredSchema.fields.map { f =>
      if (!fileSchema.containsField(f.name)) null
      else fileSchema.getType(Seq(f.name): _*).asPrimitiveType().getPrimitiveTypeName
    }
    val fileConf = new Configuration(conf)
    fileConf.set(ReadSupport.PARQUET_READ_SCHEMA, projection.toString)
    val builder = ParquetReader.builder(new GroupReadSupport(), path).withConf(fileConf)
    reader = parquetFilter(fileSchema)
      .map(p => builder.withFilter(org.apache.parquet.filter2.compat.FilterCompat.get(p)))
      .getOrElse(builder)
      .build()
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
        // partition-level constants (e.g. the feed's `_commit_timestamp`)
        // serve columns no file carries; other absent columns are NULL
        // (additive evolution)
        if (pos < 0 || g.getFieldRepetitionCount(pos) == 0)
          constants.getOrElse(requiredSchema.fields(i).name, null)
        else requiredSchema.fields(i).dataType match {
          // widened columns (Cdc.widenColumn): a pre-widening file's
          // narrow primitive up-casts — exact embeddings both
          case LongType
            if filePrim(i) == org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32 =>
            g.getInteger(pos, 0).toLong
          case DoubleType
            if filePrim(i) == org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.FLOAT =>
            g.getFloat(pos, 0).toDouble
          case LongType    => g.getLong(pos, 0)
          case IntegerType => g.getInteger(pos, 0)
          case DoubleType  => g.getDouble(pos, 0)
          case FloatType   => g.getFloat(pos, 0)
          case StringType  => UTF8String.fromBytes(g.getBinary(pos, 0).getBytes)
          case BooleanType => g.getBoolean(pos, 0)
          case DateType    => g.getInteger(pos, 0) // parquet DATE = days since epoch
          case TimestampType => g.getLong(pos, 0)  // TIMESTAMP(MICROS) in segment files
          // DECIMAL: decode whatever physical class the FILE chose
          // (INT32 for p<=9, INT64 for p<=18, FLBA/BINARY above) into the
          // REQUESTED precision/scale — precision widening
          // (Cdc.widenColumn DECIMAL(p,s)->DECIMAL(p+k,s)) is exactly a
          // narrow physical read under a wider logical type; the scale
          // never changes across a widening, so the unscaled value maps 1:1
          case dec: DecimalType => filePrim(i) match {
            case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32 =>
              org.apache.spark.sql.types.Decimal(
                g.getInteger(pos, 0).toLong, dec.precision, dec.scale)
            case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64 =>
              org.apache.spark.sql.types.Decimal(
                g.getLong(pos, 0), dec.precision, dec.scale)
            case _ => // FIXED_LEN_BYTE_ARRAY / BINARY: big-endian unscaled bytes
              org.apache.spark.sql.types.Decimal(
                BigDecimal(
                  new java.math.BigInteger(g.getBinary(pos, 0).getBytes), dec.scale),
                dec.precision, dec.scale)
          }
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

/** MERGE-ON-READ fold of ONE bucket: apply the bucket's ordered delta
  * files (per-key changelog survivors with a `_cdc_op` tombstone marker,
  * written by [[graft.operators.Cdc]] delta commits) over its base files,
  * last-writer-wins per merge key, streaming.
  *
  * Shape: (1) drain the delta levels OLDEST → NEWEST into a key-indexed
  * verdict map — later puts overwrite earlier ones, so the map ends at
  * each key's final verdict; (2) stream the base files, emitting every
  * row whose key has no verdict (verdict'd keys are superseded — updated
  * or deleted); (3) emit the non-tombstone verdicts. Memory is
  * O(delta rows in this bucket) — exactly the merge-on-read premise
  * (deltas are DML-sized, the base is bucket-sized and streams through).
  * Compaction ([[graft.operators.Cdc.compactStore]]) bounds delta depth.
  *
  * The keys are read from the files even when the query projected them
  * out (`innerSchema` appends them); emitted rows are trimmed back to
  * the scan's declared schema. Key panels apply inside both sub-readers
  * — key-equality pruning drops a key's rows on every level together, so
  * the fold stays consistent; arbitrary payload filters are excluded by
  * the planner for exactly the opposite reason. */
class CdcMorPartitionReader(
    baseFiles: Array[String],
    deltaLevels: Array[Array[String]],
    requiredSchema: StructType,
    keyNames: Array[String],
    keyTypes: Array[DataType],
    keyFilters: Array[(String, Array[Any])] = Array.empty,
    constants: Map[String, Any] = Map.empty,
    /** Lazy bucket-split slice `(nBuckets, bucket)`: base files are the
      * PARENT's (shared with sibling children) — emit only rows whose
      * layout hash lands in `bucket`. Delta rows are native to the child
      * (written post-split at its coordinate) and need no slicing. With
      * empty `deltaLevels` this degenerates to a sliced base stream —
      * the lazily-split clean-bucket reader. */
    slice: Option[(Int, Int)] = None)
    extends PartitionReader[InternalRow] {

  private val extraKeys: Array[StructField] =
    keyNames.zip(keyTypes).collect {
      case (n, t) if !requiredSchema.fieldNames.contains(n) => StructField(n, t, nullable = true)
    }
  private val innerSchema = StructType(requiredSchema.fields ++ extraKeys)
  private val deltaSchema = StructType(
    innerSchema.fields :+ StructField(graft.operators.Cdc.DeltaOpCol, StringType, nullable = true))
  private val keyIdx: Array[Int] = keyNames.map(innerSchema.fieldIndex)
  private val keyDts: Array[DataType] = keyIdx.map(innerSchema.fields(_).dataType)
  private val opIdx = deltaSchema.length - 1

  private def keyOf(row: InternalRow): List[Any] =
    keyIdx.indices.map(i =>
      if (row.isNullAt(keyIdx(i))) null else row.get(keyIdx(i), keyDts(i))).toList

  // the store's layout hash over THIS row's keys — the same Catalyst
  // XxHash64 bucketExpr compiles to, evaluated interpreted per row
  @transient private lazy val sliceHash: XxHash64 = XxHash64(
    keyIdx.zip(keyDts).map { case (i, t) =>
      org.apache.spark.sql.catalyst.expressions.BoundReference(i, t, nullable = true)
        : org.apache.spark.sql.catalyst.expressions.Expression
    }.toIndexedSeq, 42L)

  private def inSlice(row: InternalRow): Boolean = slice.forall { case (n, b) =>
    val m = sliceHash.eval(row).asInstanceOf[Long] % n
    (if (m < 0) m + n else m).toInt == b
  }

  // final verdict per delta'd key: true = tombstoned, false = row below wins
  private val verdicts = new java.util.LinkedHashMap[List[Any], (Boolean, InternalRow)]()
  locally {
    deltaLevels.foreach { files =>
      // constants (e.g. the `_bucket` metadata column) fill absent fields
      // inside the sub-reader, same as for base files
      val r = new CdcPartitionReader(files, deltaSchema, keyFilters, constants)
      try while (r.next()) {
        val row = r.get() // fresh GenericInternalRow per next(): safe to retain
        val del = !row.isNullAt(opIdx) && row.getUTF8String(opIdx).toString == "D"
        verdicts.put(keyOf(row), (del, row))
      } finally r.close()
    }
  }

  private val base = new CdcPartitionReader(baseFiles, innerSchema, keyFilters, constants)
  private var baseDone = false
  private var verdictIt: java.util.Iterator[(Boolean, InternalRow)] = _
  private var current: InternalRow = _

  private def trim(row: InternalRow): InternalRow =
    if (extraKeys.isEmpty && (row.numFields == requiredSchema.length)) row
    else {
      val out = new Array[Any](requiredSchema.length)
      var i = 0
      while (i < out.length) { out(i) = row.get(i, requiredSchema.fields(i).dataType); i += 1 }
      InternalRow.fromSeq(out.toIndexedSeq)
    }

  override def next(): Boolean = {
    while (!baseDone) {
      if (base.next()) {
        val row = base.get()
        if (inSlice(row) && !verdicts.containsKey(keyOf(row))) {
          current = trim(row); return true
        }
      } else {
        baseDone = true
        base.close()
        verdictIt = verdicts.values().iterator()
      }
    }
    while (verdictIt.hasNext) {
      val (del, row) = verdictIt.next()
      if (!del) { current = trim(row); return true }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (!baseDone) base.close()
}
