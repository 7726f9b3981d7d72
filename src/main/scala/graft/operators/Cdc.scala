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
