package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
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

  // --- property laws over ScalaCheck-generated event logs (seed-driven,
  // same manual-generation convention as LawsSpec) ---

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, rng.Seed(1311L + i)))

  private val logGen: Gen[List[(Long, Int, String)]] =
    Gen.listOfN(
      120,
      Gen.zip(
        Gen.choose(1L, 12L),
        Gen.choose(0, 5000),
        Gen.oneOf("view", "click", "purchase", "other")))

  test("law: stage times are monotone and null-prefix-closed") {
    samples(logGen, 5).foreach { rows =>
      val got = Funnel
        .stageTimes(ev(rows: _*), col("user_id"), col("ts"), col("event_type"), steps)
        .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
        .collect()
      got.foreach { case (u, t1, t2, t3) =>
        // no stage skipping: a null stage nulls everything after it
        assert(!(t1.isEmpty && t2.nonEmpty), s"user $u: t2 without t1")
        assert(!(t2.isEmpty && t3.nonEmpty), s"user $u: t3 without t2")
        // ordered: each stage at or after the previous one
        for (a <- t1; b <- t2) assert(!b.before(a), s"user $u: t2 $b before t1 $a")
        for (a <- t2; b <- t3) assert(!b.before(a), s"user $u: t3 $b before t2 $a")
      }
    }
  }

  test("law: funnel reach counts are non-increasing down the steps") {
    samples(logGen, 5).foreach { rows =>
      val (total, r1, r2, r3, _) = Funnel
        .report(ev(rows: _*), col("user_id"), col("ts"), col("event_type"), steps)
        .as[(Long, Long, Long, Long, Option[Double])]
        .collect()
        .head
      assert(total >= r1 && r1 >= r2 && r2 >= r3 && r3 >= 0L, s"$total >= $r1 >= $r2 >= $r3")
    }
  }

  test("law: funnel and retention are input-order and partitioning invariant") {
    samples(logGen, 3).foreach { rows =>
      val a = ev(rows: _*)
      val b = ev(scala.util.Random.javaRandomToRandom(new java.util.Random(7))
        .shuffle(rows): _*).repartition(7)
      def stagesOf(df: org.apache.spark.sql.DataFrame) = Funnel
        .stageTimes(df, col("user_id"), col("ts"), col("event_type"), steps)
        .collect().map(_.toSeq).toSet
      def cohortsOf(df: org.apache.spark.sql.DataFrame) = Funnel
        .cohortRetention(df, col("user_id"), col("ts"))
        .collect().map(_.toSeq).toSet
      assert(stagesOf(a) === stagesOf(b))
      assert(cohortsOf(a) === cohortsOf(b))
    }
  }

  test("law: every cohort peaks at offset 0 (first week is full activity)") {
    samples(logGen, 5).foreach { rows =>
      val got = Funnel
        .cohortRetention(ev(rows: _*), col("user_id"), col("ts"))
        .select(col("cohort_week").cast("string"), col("week_offset"), col("active_users"))
        .as[(String, Long, Long)]
        .collect()
      assert(got.forall(_._2 >= 0L), "negative week offset")
      val byCohort = got.groupBy(_._1)
      byCohort.foreach { case (cw, rs) =>
        val at0 = rs.find(_._2 == 0L)
        assert(at0.nonEmpty, s"cohort $cw missing offset-0 row")
        // a member is by definition active in its first week, so offset 0
        // counts the whole cohort and bounds every later week
        assert(rs.forall(_._3 <= at0.get._3), s"cohort $cw exceeds its offset-0 size")
      }
    }
  }

  test("repeated step NAMES: the same type can gate two stages; >= lets one event serve both") {
    // steps = view → click → view. User 1 has a genuine second view after
    // the click; user 2's only view precedes the click, so with >= the
    // re-view stage is null; user 3's click and view share a timestamp, so
    // the SINGLE view event satisfies stage 1 AND stage 3 (documented >=
    // semantics — same-instant later stages count).
    val rep = Seq("view", "click", "view")
    val events = ev(
      (1L, 1, "view"), (1L, 2, "click"), (1L, 3, "view"),
      (2L, 1, "view"), (2L, 2, "click"),
      (3L, 1, "view"), (3L, 1, "click"))
    val got = Funnel
      .stageTimes(events, col("user_id"), col("ts"), col("event_type"), rep)
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect()
      .sortBy(_._1)
    assert(got === Seq(
      (1L, Some(ts(1)), Some(ts(2)), Some(ts(3))),
      (2L, Some(ts(1)), Some(ts(2)), None),
      (3L, Some(ts(1)), Some(ts(1)), Some(ts(1)))))
  }

  test("law: duplicated + out-of-order events never change stage times or the report") {
    samples(logGen, 3).foreach { rows =>
      // Duplicate a deterministic half of the log and reverse the order —
      // at-least-once delivery + shard interleaving. min()-based stages
      // must be idempotent under both.
      val noisy = (rows ++ rows.zipWithIndex.collect { case (r, i) if i % 2 == 0 => r }).reverse
      def stagesOf(rs: Seq[(Long, Int, String)]) = Funnel
        .stageTimes(ev(rs: _*), col("user_id"), col("ts"), col("event_type"), steps)
        .collect().map(_.toSeq).toSet
      def reportOf(rs: Seq[(Long, Int, String)]) = Funnel
        .report(ev(rs: _*), col("user_id"), col("ts"), col("event_type"), steps)
        .collect().map(_.toSeq).toSet
      assert(stagesOf(rows) === stagesOf(noisy))
      assert(reportOf(rows) === reportOf(noisy))
    }
  }

  test("dropoffReport: per-stage reached/lost/step_rate, stage-1 lost = non-entrants") {
    val events = ev(
      (1L, 1, "view"), (1L, 2, "click"), (1L, 3, "purchase"),
      (2L, 1, "view"), (2L, 2, "click"),
      (3L, 1, "view"),
      (4L, 1, "click")) // never views → lost at stage 1
    val got = Funnel
      .dropoffReport(events, col("user_id"), col("ts"), col("event_type"), steps)
      .as[(Long, String, Long, Long, Double)]
      .collect()
    assert(got === Seq(
      (1L, "view", 3L, 1L, 0.75),
      (2L, "click", 2L, 1L, 0.6667),
      (3L, "purchase", 1L, 1L, 0.5)))
  }

  test("dropoffReport on an empty log: zero reached, null step rates (no NaN/Inf)") {
    val got = Funnel
      .dropoffReport(ev(), col("user_id"), col("ts"), col("event_type"), steps)
      .as[(Long, String, Long, Long, Option[Double])]
      .collect()
    assert(got.map(r => (r._1, r._3, r._4, r._5)) ===
      Seq((1L, 0L, 0L, None), (2L, 0L, 0L, None), (3L, 0L, 0L, None)))
  }

  test("law: dropoff telescopes — users_total - reached_last = sum(lost); rates in [0,1]") {
    samples(logGen, 5).foreach { rows =>
      val total = Funnel
        .report(ev(rows: _*), col("user_id"), col("ts"), col("event_type"), steps)
        .select(col("users_total")).as[Long].collect().head
      val d = Funnel
        .dropoffReport(ev(rows: _*), col("user_id"), col("ts"), col("event_type"), steps)
        .as[(Long, String, Long, Long, Option[Double])]
        .collect()
        .sortBy(_._1)
      assert(total - d.last._3 === d.map(_._4).sum)
      d.foreach { case (st, _, _, lost, rate) =>
        assert(lost >= 0L, s"stage $st negative lost")
        rate.foreach(r => assert(r >= 0.0 && r <= 1.0, s"stage $st rate $r"))
      }
    }
  }

  test("conversion window: late stages outside t1 + within don't count") {
    val events = ev(
      (1L, 0, "view"), (1L, 5, "click"), (1L, 9, "purchase"),   // all inside 10 min
      (2L, 0, "view"), (2L, 5, "click"), (2L, 30, "purchase"),  // purchase too late
      (3L, 0, "view"), (3L, 30, "click"), (3L, 31, "purchase")) // click already late
    val got = Funnel
      .stageTimesWithin(events, col("user_id"), col("ts"), col("event_type"), steps,
        withinSeconds = Some(600L))
      .select(col("user"), col("t1").isNotNull, col("t2").isNotNull, col("t3").isNotNull)
      .as[(Long, Boolean, Boolean, Boolean)]
      .collect()
      .sortBy(_._1)
    assert(got === Seq(
      (1L, true, true, true),
      (2L, true, true, false),
      (3L, true, false, false)))
  }

  test("law: windowed funnel reach is a subset of the unwindowed funnel's") {
    samples(logGen, 5).foreach { rows =>
      def reach(within: Option[Long]) = Funnel
        .stageTimesWithin(ev(rows: _*), col("user_id"), col("ts"), col("event_type"), steps, within)
        .select(col("user"), col("t2").isNotNull, col("t3").isNotNull)
        .as[(Long, Boolean, Boolean)]
        .collect()
        .map(r => r._1 -> (r._2, r._3))
        .toMap
      val bounded   = reach(Some(3600L))
      val unbounded = reach(None)
      bounded.foreach { case (u, (b2, b3)) =>
        val (u2, u3) = unbounded(u)
        assert(!b2 || u2, s"user $u reaches stage 2 only when windowed")
        assert(!b3 || u3, s"user $u reaches stage 3 only when windowed")
      }
      // within = None must be stageTimes exactly
      assert(reach(None) === Funnel
        .stageTimes(ev(rows: _*), col("user_id"), col("ts"), col("event_type"), steps)
        .select(col("user"), col("t2").isNotNull, col("t3").isNotNull)
        .as[(Long, Boolean, Boolean)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap)
    }
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
