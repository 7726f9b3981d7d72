package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff (SURVEY §2.D D0/D1 extension) — the delta pass of
  * versioned corpus management: given two snapshots of a keyed corpus,
  * classify every id as added / removed / changed / unchanged by content
  * hash. This is what an incremental pipeline runs between crawls to
  * decide which docs re-enter dedup/quality/encoding, and what a data
  * audit reads to explain a training-set change.
  *
  * 100 TB shape: each side reduces to (id, sha256) — a narrow projection,
  * no text ever crosses the wire — then ONE full-outer keyed shuffle join
  * on id; classification is a narrow CASE. Cost is two scans + one
  * id-hash-sized shuffle regardless of doc size; summary() folds the
  * status column with a 4-row hash agg. */
object SnapshotDiff {

  /** Per-id classification: (id, status, old_hash, new_hash), status ∈
    * {added, removed, changed, unchanged}. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: Column, contentCol: Column): DataFrame = {
    def sig(df: DataFrame, hashName: String) =
      df.select(idCol.cast("long").as("id"), sha2(contentCol, 256).as(hashName))
    sig(oldSnap, "old_hash")
      .join(sig(newSnap, "new_hash"), Seq("id"), "full_outer")
      .withColumn(
        "status",
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") === col("new_hash"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col("id"), col("status"), col("old_hash"), col("new_hash"))
  }

  /** Status → count roll-up of diff(). */
  def summary(d: DataFrame): DataFrame =
    d.groupBy(col("status")).agg(count(lit(1)).as("n"))
}
