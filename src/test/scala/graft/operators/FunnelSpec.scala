package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1704067200000L + min * 60000L) // 2024-01-01 + min

  private def ev(rows: (Long, Int, String)*) =
    rows.toSeq.toDF("user_id", "m", "event_type")
      .select(col("user_id"), expr("timestamp_millis(1704067200000 + m * 60000)").as("ts"),
        col("event_type"))

  private val steps = Seq("view", "click", "purchase")

  test("stages are strictly ordered: events before the prior stage don't count") {
    val events = ev(
      (1L, 1, "view"), (1L, 2, "click"), (1L, 3, "purchase"),     // full funnel
      (2L, 1, "purchase"), (2L, 2, "view"), (2L, 3, "click"),     // purchase too early
      (3L, 1, "click"), (3L, 2, "view"), (3L, 3, "click"), (3L, 4, "purchase"), // early click ignored
      (4L, 1, "view"),                                            // stops at view
      (5L, 1, "click"), (5L, 2, "purchase"))                      // never views
    val got = Funnel
      .stageTimes(events, col("user_id"), col("ts"), col("event_type"), steps)
      .select(col("user"), col("t1").isNotNull, col("t2").isNotNull, col("t3").isNotNull)
      .as[(Long, Boolean, Boolean, Boolean)]
      .collect()
      .sortBy(_._1)
    assert(got === Seq(
      (1L, true, true, true),
      (2L, true, true, false),
      (3L, true, true, true),
      (4L, true, false, false),
      (5L, false, false, false)))
  }

  test("same-timestamp later stage counts (>= semantics) and t-values are the mins") {
    val events = ev((7L, 5, "view"), (7L, 5, "click"), (7L, 9, "click"), (7L, 10, "purchase"))
    val row = Funnel
      .stageTimes(events, col("user_id"), col("ts"), col("event_type"), steps)
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect()
      .head
    assert(row === ((7L, Some(ts(5)), Some(ts(5)), Some(ts(10)))))
  }

  test("report counts stage reach and end-to-end conversion over stage-1 users") {
    val events = ev(
      (1L, 1, "view"), (1L, 2, "click"), (1L, 3, "purchase"),
      (2L, 1, "view"), (2L, 2, "click"),
      (3L, 1, "view"),
      (4L, 1, "click")) // no view: in users_total, not in any stage
    val r = Funnel
      .report(events, col("user_id"), col("ts"), col("event_type"), steps)
      .as[(Long, Long, Long, Long, Double)]
      .collect()
      .head
    assert(r === ((4L, 3L, 2L, 1L, 0.3333)))
  }

  test("cohortRetention: Monday cohorts, exact week offsets, distinct users") {
    // 2024-01-01 is a Monday. u1 first seen week 0, active weeks 0 and 2;
    // u2 first seen week 1 (two events same week dedup to one active row).
    val events = ev(
      (1L, 0, "view"), (1L, 2 * 7 * 24 * 60, "view"), (1L, 2 * 7 * 24 * 60 + 5, "click"),
      (2L, 7 * 24 * 60, "view"), (2L, 7 * 24 * 60 + 1, "view"))
    val got = Funnel
      .cohortRetention(events, col("user_id"), col("ts"))
      .select(col("cohort_week").cast("string"), col("week_offset"), col("active_users"))
      .as[(String, Long, Long)]
      .collect()
      .sortBy(r => (r._1, r._2))
    assert(got === Seq(
      ("2024-01-01", 0L, 1L),
      ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L)))
  }
}
