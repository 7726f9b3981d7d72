package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loaders (TESTDATA.md / FIXTURES.md).
  *
  * Capability surface derived from the reference's batch stand-in tables:
  * the `events` table is the batch twin of the Arc Kinesis feed the
  * reference filters (reference: README.md:2 "Filters ARC kinesis feed
  * events").
  *
  * Scale notes (100 TB discipline): every loader returns a plain
  * `spark.read.parquet` scan so Catalyst's DSv2 pushdown / column pruning /
  * partition pruning apply unchanged when the single-file fixtures are
  * swapped for partitioned multi-file datasets.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** ADAPTIVE rebalance for CPU-bound narrow stages (tokenize, render,
    * codec, fingerprint): when the source under-partitions — a single
    * unsplittable parquet row group, a small compressed file hiding
    * minutes of per-row CPU — the whole stage serializes on one core no
    * matter how many executors exist. If the input has fewer than half
    * the cluster's default parallelism in partitions, shuffle it out;
    * otherwise NO-OP, so at real scale (thousands of input splits) no
    * exchange is added and narrow plans stay narrow. The rebalance
    * shuffles raw input rows once — by definition cheaper than the
    * CPU-bound work it parallelizes, which is the only context callers
    * may use it in. */
  def rebalanceForCpu(df: DataFrame): DataFrame = {
    val spark  = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // streaming frames have no inspectable partitioning at build time (and
    // `.rdd` would throw); micro-batch sources size their own splits
    if (df.isStreaming) return df
    // `df.queryExecution.toRdd` inspects the CACHED physical plan without
    // `df.rdd`'s extra deserializer round — `.rdd` wraps the plan in a new
    // Dataset and plans it a second time on every call, a cost this
    // build-time probe was paying even on the common no-op path
    val parts = df.queryExecution.toRdd.getNumPartitions
    if (parts * 2 < target) df.repartition(target) else df
  }

  /** [[rebalanceForCpu]] keyed on a (near-)unique column: HASH
    * partitioning instead of round-robin, which skips the deterministic
    * per-partition pre-sort every keyless `repartition(n)` pays
    * (`spark.sql.execution.sortBeforeRepartition`, needed so retried
    * round-robin tasks reproduce their row→partition assignment — hash
    * partitioning is deterministic by construction, guide §2.5). Measured
    * r21: the pre-sort of a 600k-row fixture partition cost more than the
    * single-core aggregation it parallelized (c12_approx_distinct 1.5 →
    * 3.1 s keyless, 1.1 s keyed). The key must be high-cardinality
    * (20-100× the partition count) or the hash spread itself skews. */
  def rebalanceForCpuBy(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val spark  = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (df.isStreaming) return df
    val parts = df.queryExecution.toRdd.getNumPartitions
    if (parts * 2 < target) df.repartition(target, key) else df
  }

  def region(spark: SparkSession, sf: String): DataFrame   = table(spark, sf, "region")
  def nation(spark: SparkSession, sf: String): DataFrame   = table(spark, sf, "nation")
  def customer(spark: SparkSession, sf: String): DataFrame = table(spark, sf, "customer")
  def supplier(spark: SparkSession, sf: String): DataFrame = table(spark, sf, "supplier")
  def part(spark: SparkSession, sf: String): DataFrame     = table(spark, sf, "part")
  def orders(spark: SparkSession, sf: String): DataFrame   = table(spark, sf, "orders")
  def lineitem(spark: SparkSession, sf: String): DataFrame = table(spark, sf, "lineitem")
  def documents(spark: SparkSession, sf: String): DataFrame  = table(spark, sf, "documents")
  def embeddings(spark: SparkSession, sf: String): DataFrame = table(spark, sf, "embeddings")

  /** `events.parquet` has shipped with two physical `ts` encodings across
    * fixture generations, and the loader tolerates both by dispatching on
    * the READ schema (one cheap footer inspection, no data pass):
    *
    *  - parquet `TIMESTAMP(NANOS)` (early fixtures): Spark's schema
    *    converter rejects it outright ([PARQUET_TYPE_ILLEGAL]), so we read
    *    nanos as raw longs (`spark.sql.legacy.parquet.nanosAsLong`) and
    *    convert to µs `TimestampType` with integer division (`DIV`, exact
    *    on longs — a double divide would corrupt µs digits at 1.7e18
    *    magnitudes). Floor division matches DuckDB's ns→µs truncation.
    *  - parquet `TIMESTAMP(MICROS, isAdjustedToUTC=false)` (current
    *    fixtures): Spark reads `TIMESTAMP_NTZ`; a cast to `TimestampType`
    *    under the UTC session zone preserves the wall-clock digits and
    *    keeps every downstream window/watermark/interval operator on the
    *    instant type they expect.
    *
    * The `nanosAsLong` flag is session configuration, not per-query state:
    * it is set where sessions are built (Verify/Bench/TestSpark builders,
    * [[graft.SparkEntry.entry]] for the driver-owned session) so query
    * functions stay side-effect-free (SURVEY §7.5). [[ensureNanosConf]] is
    * that one idempotent knob; it is harmless when the fixture is µs. */
  def ensureNanosConf(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def events(spark: SparkSession, sf: String): DataFrame = {
    val raw = table(spark, sf, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
