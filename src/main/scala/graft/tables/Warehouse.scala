package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CATALOG-BACKED session artifacts: bucketed twins of the fixture fact
  * tables, plus ANALYZE-grade statistics pushed into the catalog.
  *
  * Why this exists (the 100 TB repeated-join story): a fact table that is
  * joined on the same key by many queries per day should pay its shuffle
  * ONCE, at write time. `bucketBy(n, key)` hash-clusters the files on the
  * join key so every later equi-join on that key is exchange-free — the
  * scan itself reports `HashPartitioning(key, n)` and (with one file per
  * bucket and `sortBy`) sorted output, so a SortMergeJoin of two
  * co-bucketed tables needs ZERO Exchange and ZERO Sort. That is the
  * same contract as Hive bucketing / Iceberg bucket-partitioning; on a
  * 1000-executor cluster it deletes the dominant shuffle of every
  * orders⋈lineitem-shaped query.
  *
  * Mechanics that make the exchange-free read real:
  *  - the frame is `repartition(n, key)`-ed before the write — Spark's
  *    bucket hash and repartition hash are the same pmod(murmur3, n), so
  *    each task holds exactly one bucket and writes exactly ONE file per
  *    bucket. One-file-per-bucket is what lets the reader trust per-file
  *    sort order and skip the SMJ sort.
  *  - `sortBy(key)` orders rows inside each bucket file.
  *  - stats ([[analyze]]) land in the catalog so the CBO
  *    (`spark.sql.cbo.enabled` + CostBasedJoinReorder) can reorder
  *    multi-join plans on real cardinalities instead of raw file sizes.
  *
  * Tables are session artifacts keyed by sf dir (the CDC-store / IVF-index
  * discipline): built once per session into the session warehouse,
  * reused by every serving query; Bench attributes the build to
  * `artifact_build_sec`, not to the queries.
  */
object Warehouse {

  val NBuckets = 16

  private val builtPairs = scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private val analyzed   = scala.collection.concurrent.TrieMap.empty[String, Boolean]

  private def tag(sf: String): String =
    sf.replaceAll("[^A-Za-z0-9]", "_").toLowerCase

  /** Ensure the bucketed (orders, lineitem) twins for `sf` exist in the
    * session catalog; returns their table names. Idempotent per session;
    * `mode(overwrite)` makes a rebuild over a stale warehouse safe. */
  def bucketedPair(s: SparkSession, sf: String): (String, String) =
    builtPairs.getOrElseUpdate(sf, {
      val ord = s"graft_orders_bkt_${tag(sf)}"
      val li  = s"graft_lineitem_bkt_${tag(sf)}"
      writeBucketed(Tables.orders(s, sf), "o_orderkey", ord)
      writeBucketed(Tables.lineitem(s, sf), "l_orderkey", li)
      (ord, li)
    })

  private def writeBucketed(df: DataFrame, key: String, name: String): Unit = {
    dropOrphanLocation(df.sparkSession, name)
    df.repartition(NBuckets, col(key)) // one task per bucket ⇒ one file per bucket
      .write
      .format("parquet")
      .bucketBy(NBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(name)
  }

  /** A managed table's location can outlive its catalog entry (in-memory
    * catalog + persistent warehouse dir across JVMs, or a crash between
    * data write and catalog commit). `saveAsTable` refuses to adopt such
    * an orphan even in overwrite mode (LOCATION_ALREADY_EXISTS), so
    * delete it first — but ONLY when the catalog does not know the table;
    * a registered table is `mode(overwrite)`'s job, not ours. */
  private def dropOrphanLocation(s: SparkSession, name: String): Unit =
    if (!s.catalog.tableExists(name)) {
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }

  /** Push ANALYZE-grade table + column statistics for the bucketed twins
    * (plus a catalog copy of `customer`, the third relation of the
    * canonical reorder chain) into the catalog, so `optimizedPlan.stats`
    * carries real rowCount/NDV and CostBasedJoinReorder has something to
    * cost. This is the c37_analyze_stats profile WIRED INTO the
    * optimizer instead of only reported. Returns the three table names
    * (orders, lineitem, customer). */
  def analyze(s: SparkSession, sf: String): (String, String, String) = {
    val (ord, li) = bucketedPair(s, sf)
    val cust = s"graft_customer_${tag(sf)}"
    analyzed.getOrElseUpdate(sf, {
      dropOrphanLocation(s, cust)
      Tables.customer(s, sf).write.format("parquet").mode("overwrite").saveAsTable(cust)
      s.sql(s"ANALYZE TABLE $ord COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_custkey, o_orderstatus")
      s.sql(s"ANALYZE TABLE $li COMPUTE STATISTICS FOR COLUMNS l_orderkey, l_extendedprice")
      s.sql(s"ANALYZE TABLE $cust COMPUTE STATISTICS FOR COLUMNS c_custkey, c_mktsegment")
      true
    })
    (ord, li, cust)
  }
}
