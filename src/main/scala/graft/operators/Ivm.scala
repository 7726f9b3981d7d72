package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for grouped aggregates (SURVEY.md §2.C
  * extension) — the DBSP/differential-dataflow core: a CHANGELOG of
  * weighted rows (op = +1 insert / −1 retract, any long weight) maintains
  * a (count, sum)-per-key aggregate view without recomputing the base
  * table. This is how a 100 TB materialized view absorbs a GB-sized daily
  * delta: the data-sized work is one keyed aggregate of the DELTA, and
  * the merge touches state + delta, never the raw history.
  *
  * State contract:
  *  - `aggDelta` turns a changelog batch into per-key state rows
  *    (`cnt` = Σop, `total` = Σ op·value as DECIMAL(28,4) — each addend
  *    cast to decimal first, the repo's exact-sum convention, so state is
  *    bit-identical under any partitioning and batch order).
  *  - `applyDelta` merges state frames by key (union + re-aggregate —
  *    with the state table BUCKETED on the key this is a map-side merge;
  *    both sides shuffle at most once regardless) and DROPS groups whose
  *    weight reaches zero: a fully-retracted key vanishes, the Z-set
  *    zero-elimination rule. The changelog must retract exactly what was
  *    inserted (the standard IVM contract); `cnt` hitting 0 with a
  *    nonzero `total` means a corrupt log, surfaced via [[auditZeros]].
  *  - Merging is associative and commutative (decimal addition over
  *    Z-weights), so deltas can arrive batched ANY way — the law the
  *    spec pins.
  *  - `view` renders state for serving: count, exact sum, derived mean.
  */
object Ivm {

  private val dec = "decimal(28,4)"

  /** Per-key state from one changelog batch. `keys` are column names in
    * `changes`; `op` is the signed weight; `value` the aggregated
    * measure. */
  def aggDelta(changes: DataFrame, op: Column, value: Column, keys: Seq[String]): DataFrame =
    changes
      .groupBy(keys.map(col): _*)
      .agg(
        sum(op.cast("long")).as("w"),
        sum((value * op.cast("double")).cast(dec)).as("t"))
      .select(keys.map(col) :+ col("w").cast("long").as("cnt") :+ col("t").cast(dec).as("total"): _*)

  /** Merge ANY number of state frames: ONE keyed aggregate over the
    * union (not a left-fold of pairwise merges — a 1000-delta log still
    * shuffles once), zero-weight groups eliminated. */
  def mergeAll(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeAll needs at least one state frame")
    states
      .reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("w"), sum(col("total")).as("t"))
      .filter(col("w") =!= 0)
      .select(keys.map(col) :+ col("w").cast("long").as("cnt") :+ col("t").cast(dec).as("total"): _*)
  }

  /** Merge two state frames (or state + delta — same thing). */
  def applyDelta(state: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    mergeAll(Seq(state, delta), keys)

  /** Corrupt-log audit: keys whose weight is zero but whose value sum is
    * not — retractions that never matched their insert. Empty on a
    * consistent changelog. */
  def auditZeros(state: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    state
      .unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("w"), sum(col("total")).as("t"))
      .filter(col("w") === 0 && col("t") =!= 0)

  /** STREAMING maintenance: each micro-batch of the changelog reduces to
    * one state delta persisted at `storePath/delta=<batchId>`. The write
    * is overwrite-by-batch-directory, so a replayed micro-batch (crash
    * between commit points) rewrites the same directory instead of
    * double-counting — exactly-once view maintenance on top of the
    * checkpoint's at-least-once replay, the same contract as
    * [[graft.pipelines.CorpusPrep.streamingPrepare]]. The served view is
    * [[readView]]'s single merge over the delta log — associativity makes
    * arrival order irrelevant, so no cross-batch coordination exists at
    * all. Delta-log growth is bounded the same way CorpusPrep bounds its
    * signature store (fold the log on a cadence); per-batch work is
    * delta-sized, never history-sized. */
  def maintainView(
      changes: DataFrame,
      op: Column,
      value: Column,
      keys: Seq[String],
      storePath: String,
      checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processViewBatch(batch, op, value, keys, storePath, id)
      }

  /** One micro-batch of [[maintainView]], exposed for replay testing. */
  def processViewBatch(
      batch: DataFrame,
      op: Column,
      value: Column,
      keys: Seq[String],
      storePath: String,
      id: Long): Unit =
    aggDelta(batch, op, value, keys).write.mode("overwrite").parquet(s"$storePath/delta=$id")

  /** Every state delta the stream has committed, UNMERGED — for consumers
    * that bootstrap from a snapshot: merge bootstrap + deltas in ONE
    * [[mergeAll]]/[[applyDelta]]. Folding the deltas ALONE through
    * [[readView]] would zero-eliminate groups whose net stream weight
    * cancels (an update's pre+post images: w = 0, value moved) — correct
    * for a view that saw its whole history, silently value-dropping for
    * one that starts mid-stream. Throws if no delta exists yet (the
    * view's schema is data-defined). */
  def readDeltas(spark: org.apache.spark.sql.SparkSession, storePath: String): DataFrame = {
    // Hadoop FS listing, not java.io.File: the store may live on any
    // scheme (hdfs://, s3a://) — a java.io listing would see an empty
    // dir there and throw below despite committed deltas existing.
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs   = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deltas =
      if (!fs.exists(root)) Array.empty[String]
      else
        fs.listStatus(root)
          // a crash mid-write leaves a delta= directory without Spark's
          // _SUCCESS marker: reading it would fold a torn partial delta
          // into the view; the checkpoint replays that batch and
          // overwrites it
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("delta=") &&
            fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
          .map(_.getPath.toString)
    if (deltas.isEmpty)
      throw new IllegalStateException(s"no committed deltas under $storePath")
    spark.read.parquet(deltas.toIndexedSeq: _*)
  }

  /** The maintained view as of now: one [[mergeAll]] over every delta the
    * stream has committed — for a stream that saw its WHOLE history from
    * the first insert (zero-weight groups really are fully retracted).
    * Bootstrapping consumers compose [[readDeltas]] with their snapshot
    * state instead. */
  def readView(spark: org.apache.spark.sql.SparkSession, storePath: String, keys: Seq[String]): DataFrame =
    mergeAll(Seq(readDeltas(spark, storePath)), keys)

  /** Serving projection: exact count/sum plus the derived mean. The mean
    * is null-guarded (ANSI mode throws on /0) for callers handing in a
    * raw [[aggDelta]] frame that still carries zero-weight rows —
    * [[mergeAll]]/[[applyDelta]] output never does. */
  def view(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(
      keys.map(col)
        :+ col("cnt")
        :+ col("total").cast("double").as("sum_val")
        :+ round(
          when(col("cnt") =!= 0, col("total").cast("double") / col("cnt").cast("double")),
          6).as("avg_val"): _*)
}
