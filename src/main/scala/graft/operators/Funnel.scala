package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-step funnel and cohort-retention operators over an event log
  * (SURVEY.md §2.B extension — the canonical event-analytics reductions
  * downstream of the reference's filter feed).
  *
  * Both are deliberately JOIN-FREE: per-user stage timestamps and cohort
  * assignment are whole-partition window aggregates over ONE exchange on
  * the user key. The naive formulation (one self-join per funnel stage, or
  * a per-user first-seen dim joined back) shuffles the full event log once
  * per stage; at 100 TB that's the difference between one pass and k
  * passes. Window-over-window stays on the same partitioning, so Catalyst
  * plans a single Exchange feeding every stage.
  */
object Funnel {

  /** One row per user with nullable stage timestamps `t1..tN`.
    *
    * `t(i)` is the earliest event of `steps(i-1)` at or after `t(i-1)` —
    * strictly ordered: a user whose purchase precedes every click never
    * reaches the purchase stage. A null earlier stage nulls the `>=`
    * predicate, so later stages are null too (no stage skipping).
    */
  def stageTimes(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      steps: Seq[String]): DataFrame =
    stageTimesWithin(events, userCol, tsCol, typeCol, steps, withinSeconds = None)

  /** [[stageTimes]] with an optional CONVERSION WINDOW (the
    * Amplitude/Mixpanel funnel semantics): when `withinSeconds` is set,
    * stages 2..N only count at or before `t1 + within` — a purchase a
    * month after the view is no longer that view's conversion. Same
    * join-free single-exchange plan; the bound is one extra conjunct on
    * each stage predicate. */
  def stageTimesWithin(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      steps: Seq[String],
      withinSeconds: Option[Long]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = events.select(userCol.as("user"), tsCol.as("__ts"), typeCol.as("__type"))
    val byUser = Window.partitionBy(col("user"))
    val staged = steps.zipWithIndex.foldLeft(base) { case (df, (step, i)) =>
      val deadline = withinSeconds match {
        case Some(secs) if i > 0 =>
          col("__ts") <= col("t1") + expr(s"INTERVAL $secs SECONDS")
        case _ => lit(true)
      }
      val pred =
        if (i == 0) col("__type") === step
        else col("__type") === step && col("__ts") >= col(s"t$i") && deadline
      df.withColumn(s"t${i + 1}", min(when(pred, col("__ts"))).over(byUser))
    }
    // Stage times are per-user constants; max() is just "any".
    val aggs = steps.indices.map(i => max(col(s"t${i + 1}")).as(s"t${i + 1}"))
    staged.groupBy(col("user")).agg(aggs.head, aggs.tail: _*)
  }

  /** Single-row funnel report: total users, users reaching each stage
    * (column `reached_<step>`), and the end-to-end conversion rate from
    * the first stage. */
  def report(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      steps: Seq[String]): DataFrame = {
    val stages = stageTimes(events, userCol, tsCol, typeCol, steps)
    val counts = steps.zipWithIndex.map { case (step, i) =>
      count(col(s"t${i + 1}")).as(s"reached_$step")
    }
    stages.agg(
      count(lit(1)).as("users_total"),
      counts :+
        round(
          count(col(s"t${steps.size}")).cast("double")
            / count(col("t1")).cast("double"),
          4).as("conversion_rate"): _*)
  }

  /** Per-stage drop-off report: one row per funnel step with the users
    * reaching it, the users LOST versus the previous stage, and the
    * step-over-step conversion rate. Stage 1's "previous stage" is the
    * whole user population (`users_total` in [[report]]), so `lost` at
    * stage 1 counts users who never enter the funnel at all.
    *
    * Cost: identical to [[report]] — one user-keyed exchange for the stage
    * times, one single-row global aggregate; the per-stage pivot is an
    * `explode` over a steps-sized literal array on that one row, so the
    * added shape is O(steps) rows on the driver-bound tail, never
    * data-sized. `step_rate` is null (not NaN/∞) when the previous stage
    * is empty, matching SQL `nullif` semantics so the oracle can express
    * the same guard. */
  def dropoffReport(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      steps: Seq[String]): DataFrame = {
    val stages = stageTimes(events, userCol, tsCol, typeCol, steps)
    val counts = steps.indices.map(i => count(col(s"t${i + 1}")).as(s"r${i + 1}"))
    val one = stages.agg(count(lit(1)).as("users_total"), counts: _*)
    val stageRows = steps.zipWithIndex.map { case (step, i) =>
      struct(
        lit(i + 1).cast("long").as("stage"),
        lit(step).as("step"),
        col(s"r${i + 1}").as("reached"),
        (if (i == 0) col("users_total") else col(s"r$i")).as("prev"))
    }
    one
      .select(explode(array(stageRows: _*)).as("s"))
      .select(
        col("s.stage").as("stage"),
        col("s.step").as("step"),
        col("s.reached").as("reached"),
        (col("s.prev") - col("s.reached")).as("lost"),
        round(
          when(col("s.prev") =!= 0,
            col("s.reached").cast("double") / col("s.prev").cast("double")),
          4).as("step_rate"))
      .orderBy("stage")
  }

  /** Weekly cohort retention: one row per (cohort_week, week_offset) with
    * the distinct active users. Cohort = Monday-truncated week of the
    * user's first event, assigned via a window min on the same user-keyed
    * exchange the activity weeks ride on. Offsets are exact multiples of
    * 7 days (both truncations are Monday-aligned). */
  def cohortRetention(events: DataFrame, userCol: Column, tsCol: Column): DataFrame =
    events
      .select(userCol.as("user"), date_trunc("week", tsCol).as("week"))
      .withColumn("cohort_week", min(col("week")).over(Window.partitionBy(col("user"))))
      .groupBy(col("cohort_week"), col("week"))
      .agg(countDistinct(col("user")).as("active_users"))
      .select(
        col("cohort_week").cast("date").as("cohort_week"),
        (datediff(col("week").cast("date"), col("cohort_week").cast("date")) / 7)
          .cast("long")
          .as("week_offset"),
        col("active_users"))
}
