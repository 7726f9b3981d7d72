package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history builder (SURVEY.md §2.C
  * extension) — the warehouse primitive that turns a keyed CHANGE LOG
  * (one row per observation) into validity-interval rows: one row per
  * (key, state run) with `valid_from`/`valid_to`/`version`/`is_current`,
  * consecutive identical states collapsed (a no-change observation never
  * opens a new version — the SCD2 contract).
  *
  * Join-free, like the funnel family: change-point detection (`lag`),
  * interval close-out (`lead`), and version numbering (`row_number`) are
  * three window passes over ONE exchange on the key — Catalyst plans a
  * single Exchange because every window uses the same partitioning. The
  * naive formulation (self-join each observation to its successor) would
  * shuffle the log twice and break on ties; at 100 TB the single
  * key-partitioned pass is the difference between one scan and a
  * log×log join.
  *
  * Determinism: ties on the timestamp are broken by `tieCol` (any unique
  * column — an event id, a sequence number), making the collapsed run
  * structure and version numbers reproducible under any partitioning.
  */
object Scd {

  /** One history row per (key, consecutive-state run):
    * (key, state, valid_from, valid_to, version, is_current), ordered
    * windows: `valid_to` is the NEXT run's start (half-open intervals
    * [valid_from, valid_to)), null while current. */
  def history(
      log: DataFrame,
      keyCol: Column,
      tsCol: Column,
      stateCol: Column,
      tieCol: Column): DataFrame = {
    val byKey = Window.partitionBy(col("key")).orderBy(col("ts"), col("tie"))
    log
      .select(keyCol.as("key"), tsCol.as("ts"), stateCol.as("state"), tieCol.as("tie"))
      // Change points: the first observation per key, plus every
      // observation whose state differs from its predecessor.
      .withColumn("prev_state", lag(col("state"), 1).over(byKey))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("state"))
      // Runs now being adjacent, the same key-partitioned order yields
      // interval ends and version numbers without re-shuffling.
      .withColumn("valid_to", lead(col("ts"), 1).over(Window.partitionBy(col("key")).orderBy(col("ts"), col("tie"))))
      .withColumn("version", row_number().over(Window.partitionBy(col("key")).orderBy(col("ts"), col("tie"))))
      .select(
        col("key"),
        col("state"),
        col("ts").as("valid_from"),
        col("valid_to"),
        col("version").cast("long").as("version"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Point-in-time lookup: the state of each key at `at` — the row whose
    * half-open validity interval contains the instant. */
  def asOf(history: DataFrame, at: Column): DataFrame =
    history.filter(
      col("valid_from") <= at && (col("valid_to").isNull || col("valid_to") > at))
}
