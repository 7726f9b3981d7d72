package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join (SURVEY.md §2.C C9): for each left row, the
  * single right row with the greatest `rightTime <= leftTime` among rows
  * sharing the equi-key.
  *
  * Spark has no built-in as-of join; per SURVEY §2 the preference order is
  * compose-existing-ops first. This composes an equi-join (so the range
  * condition never forces a broadcast-nested-loop over the full cross
  * space) with a per-left-row windowed rank. Catalyst plans the equi part
  * as a regular shuffle/broadcast hash join keyed on the join key, so at
  * 100 TB both sides co-partition on the key and the window sort runs
  * inside each partition — no global sort, no driver state.
  *
  * Skew note: low-cardinality keys (the fixture has 150 users) concentrate
  * partitions; at scale, salt the key or pre-bucket both sides on it.
  */
object AsOfJoin {

  /** As-of join keeping exactly one right match per left row.
    *
    * @param leftId   column uniquely identifying left rows (rank scope)
    * @param tieBreak extra ordering for right rows tied on `rightTime` —
    *                 required for deterministic output when right times
    *                 collide (e.g. day-granularity order dates)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftId: Column,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      tieBreak: Seq[Column] = Seq.empty,
      toleranceSeconds: Option[Long] = None
  ): DataFrame = {
    // Optional STALENESS BOUND (pandas merge_asof's `tolerance`): a match
    // older than `toleranceSeconds` is no match at all — the difference
    // between "the order before this event" and "the order that plausibly
    // CAUSED this event". The bound is an extra join conjunct, so besides
    // correctness it shrinks the join's candidate fan-out: at 100 TB the
    // unbounded form pairs each left row with its key's ENTIRE right
    // history before the rank-1 prune; the bounded form only with a
    // window of it.
    val fresh = toleranceSeconds
      .map(secs => rightTime >= leftTime - expr(s"INTERVAL $secs SECONDS"))
      .getOrElse(lit(true))
    val joined = left.join(right, leftKey === rightKey && rightTime <= leftTime && fresh)
    val w      = Window.partitionBy(leftId).orderBy((rightTime.desc +: tieBreak): _*)
    joined
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn")
  }

  /** FORWARD as-of: the earliest right row at-or-AFTER each left row's
    * time — "next event" semantics (next order after a touchpoint, next
    * reading after a fault), the mirror of [[asOf]]'s backward lookup.
    * Same plan shape: one equi-join on the key plus the non-equi time
    * conjunct, then a rank-1 window that WindowGroupLimit prunes
    * per-partition before the sort completes. */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      leftId: Column,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      tieBreak: Seq[Column] = Seq.empty
  ): DataFrame = {
    val joined = left.join(right, leftKey === rightKey && rightTime >= leftTime)
    val w      = Window.partitionBy(leftId).orderBy((rightTime.asc +: tieBreak): _*)
    joined
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn")
  }

  /** NEAREST as-of (pandas merge_asof direction='nearest'): the right row
    * minimizing |rightTime − leftTime|, equal distances broken toward the
    * BACKWARD match (the earlier right row — pandas' rule), then by
    * `tieBreak`. Completes the direction family next to [[asOf]]
    * (backward) and [[asOfForward]].
    *
    * `toleranceSeconds` bounds the match to ±tolerance and — as in
    * [[asOf]] — is also the SCALE lever: it rides the join as a
    * conjunct, so each left row pairs with a bounded time window of its
    * key's history instead of all of it before the rank-1 prune. Pass
    * None only when the per-key right history is known to be small. */
  def asOfNearest(
      left: DataFrame,
      right: DataFrame,
      leftId: Column,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      tieBreak: Seq[Column] = Seq.empty,
      toleranceSeconds: Option[Long] = None
  ): DataFrame = {
    val near = toleranceSeconds
      .map { secs =>
        rightTime >= leftTime - expr(s"INTERVAL $secs SECONDS") &&
          rightTime <= leftTime + expr(s"INTERVAL $secs SECONDS")
      }
      .getOrElse(lit(true))
    val joined = left.join(right, leftKey === rightKey && near)
    val dist   = abs(unix_micros(rightTime) - unix_micros(leftTime))
    val w = Window
      .partitionBy(leftId)
      .orderBy((dist.asc +: rightTime.asc +: tieBreak): _*)
    joined
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn")
  }
}
