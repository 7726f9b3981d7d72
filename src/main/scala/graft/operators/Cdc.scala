package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC upsert apply (SURVEY.md §2.C extension) — MERGE INTO semantics as
  * a batch operator: apply a changelog of keyed I/U/D records to a
  * snapshot with LAST-WRITER-WINS per key, the standard lakehouse write
  * pattern (Delta/Iceberg MERGE, Debezium sink compaction, Kafka log
  * compaction all reduce to this):
  *
  *   - a key's LATEST changelog record decides its fate: `D` removes the
  *     key, anything else (`I`/`U` — upsert does not distinguish) replaces
  *     the snapshot row with the changelog payload, inserting if the key
  *     was absent;
  *   - keys the changelog never touches keep their snapshot row verbatim;
  *   - earlier changelog records for a key are dead — compaction, not
  *     replay, so a key updated 10⁶ times costs one output row.
  *
  * Plan shape (the 100 TB argument): ONE window rank over the changelog's
  * key exchange picks the survivor per key (rank=1 filters push to
  * WindowGroupLimit, so hot keys prune below the sort — no per-key
  * buffering of the full update history), then the snapshot joins the
  * survivor key set with a LEFT ANTI (keyed shuffle or broadcast when the
  * day's delta is small — the common case: GB-sized changelog vs TB-sized
  * snapshot) and the survivors union in. The snapshot is scanned exactly
  * once and never windowed; all per-key history cost lands on the
  * changelog, which is delta-sized.
  *
  * Determinism: recency is `orderCols` ascending, later = winner; ties
  * must be broken by a unique column (sequence number / LSN) in
  * `orderCols` or the winner is partition-dependent — same contract as
  * [[Scd.history]].
  */
object Cdc {

  /** Apply `changelog` to `snapshot`. The changelog must contain every
    * `snapshot` column (the full-row payload), `opCol` ∈ {I, U, D}
    * (case-insensitive), and the `orderCols` recency columns. Returns the
    * upserted snapshot with exactly the snapshot's schema. */
  def upsert(
      snapshot: DataFrame,
      changelog: DataFrame,
      keys: Seq[String],
      orderCols: Seq[Column],
      opCol: Column): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val missing = snapshot.columns.filterNot(changelog.columns.contains)
    require(missing.isEmpty, s"changelog lacks snapshot payload columns: ${missing.mkString(",")}")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(_.desc): _*)
    val latest = changelog
      .withColumn("__op", upper(opCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val untouched = snapshot.join(latest.select(keys.map(col): _*), keys, "left_anti")
    val applied = latest
      .filter(col("__op") =!= "D")
      .select(snapshot.columns.map(col).toIndexedSeq: _*)
    untouched.unionByName(applied)
  }

  /** STREAMING maintenance: each micro-batch of the changelog MERGEs
    * into a versioned snapshot store — `storePath/v=<batchId>` holds the
    * snapshot AFTER batch `batchId`, computed by upserting the batch
    * into the latest version below it (or `seed` for the first). The
    * write is overwrite-by-version-directory, so a replayed micro-batch
    * (crash between commit points) re-reads the same parent version and
    * rewrites the same directory instead of double-applying —
    * exactly-once snapshot maintenance on top of the checkpoint's
    * at-least-once replay, the same contract as [[Ivm.maintainView]]'s
    * delta log. Unlike the Z-set path, the store holds full snapshots
    * (MERGE is not associative over retract-free rows), so serving is a
    * plain read of the newest version — [[readSnapshot]] — and version
    * retention is a cadence decision exactly like lakehouse VACUUM.
    * Per-batch work is |delta| × one window + |snapshot| × one
    * anti-join, and the batch REWRITES the full snapshot — coarse
    * copy-on-write. Honest scale note: at TB snapshots a real lakehouse
    * narrows the rewrite to touched partitions/files (MERGE file
    * skipping) or defers it entirely (delta log + merge-on-read — the
    * [[Ivm]] path, which this store deliberately does not replicate
    * because MERGE rows are not retract-complete Z-sets). The right
    * cadence at scale is therefore micro-batches sized so |delta| ≫
    * batch overhead, with this operator per PARTITION of a
    * date/key-partitioned snapshot rather than the monolith. */
  def maintainSnapshot(
      changes: DataFrame,
      seed: DataFrame,
      keys: Seq[String],
      orderCols: Seq[Column],
      opCol: Column,
      storePath: String,
      checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processSnapshotBatch(batch, seed, keys, orderCols, opCol, storePath, id)
      }

  /** One micro-batch of [[maintainSnapshot]], exposed for replay tests. */
  def processSnapshotBatch(
      batch: DataFrame,
      seed: DataFrame,
      keys: Seq[String],
      orderCols: Seq[Column],
      opCol: Column,
      storePath: String,
      id: Long): Unit = {
    val spark = batch.sparkSession
    val prior = committedVersions(storePath).filter(_ < id).sorted.lastOption match {
      case Some(v) => spark.read.parquet(s"$storePath/v=$v")
      case None    => seed
    }
    upsert(prior, batch, keys, orderCols, opCol)
      .write.mode("overwrite").parquet(s"$storePath/v=$id")
  }

  /** The maintained snapshot as of now: the newest committed version.
    * Throws if the stream has not committed anything yet. */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession, storePath: String): DataFrame = {
    val vs = committedVersions(storePath)
    if (vs.isEmpty) throw new IllegalStateException(s"no committed snapshot under $storePath")
    spark.read.parquet(s"$storePath/v=${vs.max}")
  }

  private def committedVersions(storePath: String): Seq[Long] = {
    val dir = new java.io.File(storePath)
    Option(dir.listFiles())
      .getOrElse(Array.empty)
      // a crash mid-write leaves a v= directory WITHOUT Spark's _SUCCESS
      // marker — it must be invisible as a parent, or the next batch
      // would build on a torn snapshot; its replay overwrites it anyway
      .filter(f => f.isDirectory && f.getName.startsWith("v=") &&
        new java.io.File(f, "_SUCCESS").exists())
      .map(_.getName.stripPrefix("v=").toLong)
      .toIndexedSeq
  }

  /** The deletions the apply performed: keys whose latest record is `D`
    * AND that existed in the snapshot (a delete for an absent key is a
    * no-op, per MERGE semantics). Useful for tombstone audits. */
  def deletedKeys(
      snapshot: DataFrame,
      changelog: DataFrame,
      keys: Seq[String],
      orderCols: Seq[Column],
      opCol: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(_.desc): _*)
    val latestD = changelog
      .withColumn("__op", upper(opCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("__op") === "D")
      .select(keys.map(col): _*)
    snapshot.select(keys.map(col): _*).join(latestD, keys, "left_semi")
  }
}
