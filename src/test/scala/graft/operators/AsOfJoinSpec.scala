package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks the latest right row at-or-before, per key, with tie-break") {
    val left = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")),
      (2L, 10L, ts("2024-01-01 00:00:00")), // before any order
      (3L, 20L, ts("2024-01-05 00:00:00"))
    ).toDF("eid", "key", "t")
    val right = Seq(
      (100L, 10L, ts("2024-01-02 00:00:00")),
      (101L, 10L, ts("2024-01-04 00:00:00")),
      (102L, 10L, ts("2024-01-04 00:00:00")), // tie with 101
      (103L, 20L, ts("2024-01-06 00:00:00"))  // after left ts → excluded
    ).toDF("oid", "okey", "ot")

    val out = AsOfJoin
      .asOf(left, right, col("eid"), col("key"), col("okey"), col("t"), col("ot"),
        tieBreak = Seq(col("oid").desc))
      .select("eid", "oid").as[(Long, Long)].collect().toMap

    assert(out(1L) === 102L) // latest ot, tie broken by highest oid
    assert(!out.contains(2L)) // inner as-of: no match before first order
    assert(!out.contains(3L)) // only future order for key 20
  }

  test("asOf tolerance: matches older than the staleness bound drop; inside-bound unchanged") {
    val left = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")), // latest order 1 day old → kept
      (2L, 20L, ts("2024-03-01 00:00:00"))  // only order 2 months old → dropped
    ).toDF("eid", "key", "t")
    val right = Seq(
      (100L, 10L, ts("2024-01-04 00:00:00")),
      (101L, 20L, ts("2024-01-01 00:00:00"))
    ).toDF("oid", "okey", "ot")
    val bounded = AsOfJoin
      .asOf(left, right, col("eid"), col("key"), col("okey"), col("t"), col("ot"),
        toleranceSeconds = Some(7L * 24 * 3600))
      .select("eid", "oid").as[(Long, Long)].collect().toMap
    assert(bounded === Map(1L -> 100L))
    // tolerance = None must equal the unbounded overload
    val unbounded = AsOfJoin
      .asOf(left, right, col("eid"), col("key"), col("okey"), col("t"), col("ot"))
      .select("eid", "oid").as[(Long, Long)].collect().toMap
    assert(unbounded === Map(1L -> 100L, 2L -> 101L))
  }

  test("asOfNearest: min |Δt| wins, ties break backward, tolerance excludes both directions") {
    val left = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")), // backward 1d vs forward 2d → backward
      (2L, 10L, ts("2024-01-07 12:00:00")), // forward 12h vs backward 3.5d → forward
      (3L, 10L, ts("2024-01-03 00:00:00")), // equidistant 1d both ways → backward (earlier)
      (4L, 20L, ts("2024-01-01 00:00:00"))  // only match is 10d away → outside tolerance
    ).toDF("eid", "key", "t")
    val right = Seq(
      (100L, 10L, ts("2024-01-02 00:00:00")),
      (101L, 10L, ts("2024-01-04 00:00:00")),
      (102L, 10L, ts("2024-01-08 00:00:00")),
      (103L, 20L, ts("2024-01-11 00:00:00"))
    ).toDF("oid", "okey", "ot")
    val out = AsOfJoin
      .asOfNearest(left, right, col("eid"), col("key"), col("okey"), col("t"), col("ot"),
        tieBreak = Seq(col("oid").asc), toleranceSeconds = Some(5L * 86400L))
      .select("eid", "oid").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 101L, 2L -> 102L, 3L -> 100L))
    // sanity vs both single-direction forms: nearest is never farther
    // than whichever of backward/forward matched
    assert(!out.contains(4L), "tolerance failed to exclude a distant match")
  }

  test("asOf emits exactly one row per matched left row") {
    val left  = Seq((1L, 1L, ts("2024-01-10 00:00:00"))).toDF("eid", "key", "t")
    val right = (1 to 50).map(i => (i.toLong, 1L, ts(f"2024-01-${i % 9 + 1}%02d 00:00:00"))).toDF("oid", "okey", "ot")
    val out = AsOfJoin.asOf(left, right, col("eid"), col("key"), col("okey"), col("t"), col("ot"),
      tieBreak = Seq(col("oid").desc))
    assert(out.count() === 1L)
  }

  test("asOfMerge: custom plan node ≡ the composed join+window form, on random data") {
    import graft.plans.AsOfMergeJoin
    (0 until 4).foreach { seed =>
      val rnd = new scala.util.Random(31L + seed)
      val left = (0 until 200).map { i =>
        (i.toLong, rnd.nextInt(8).toLong, ts(f"2024-01-${1 + rnd.nextInt(28)}%02d 0${rnd.nextInt(10)}:00:00"))
      }.toDF("eid", "key", "t")
      val right = (0 until 150).map { i =>
        (i.toLong, rnd.nextInt(10).toLong, ts(f"2024-01-${1 + rnd.nextInt(28)}%02d 0${rnd.nextInt(10)}:00:00"))
      }.toDF("oid", "okey", "ot")

      val composed = AsOfJoin
        .asOf(left, right, col("eid"), col("key"), col("okey"), col("t"), col("ot"),
          tieBreak = Seq(col("oid").desc))
        .select("eid", "oid", "ot").as[(Long, Long, Timestamp)].collect().sorted.toSeq
      val merged = AsOfMergeJoin
        .asOfMerge(left, right, "key", "okey", "t", "ot", tieBreak = Seq("oid"))
        .select("eid", "oid", "ot").as[(Long, Long, Timestamp)].collect().sorted.toSeq
      assert(merged === composed, s"seed $seed")
    }
  }

  test("asOfMerge: plans the custom exec — no Window, no rank, exchanges on the keys") {
    import graft.plans.AsOfMergeJoin
    val left  = Seq((1L, 10L, ts("2024-01-05 00:00:00"))).toDF("eid", "key", "t")
    val right = Seq((100L, 10L, ts("2024-01-02 00:00:00"))).toDF("oid", "okey", "ot")
    val df = AsOfMergeJoin.asOfMerge(left, right, "key", "okey", "t", "ot", Seq("oid"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), plan.take(2000))
    assert(!plan.contains("Window"), "custom as-of must not fall back to join+window")
    // and it returns the right answer
    val out = df.select("eid", "oid").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 100L)))
  }

  test("asOfMerge outer: every left row survives; matched rows equal the inner result") {
    import graft.plans.AsOfMergeJoin
    val left = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")),
      (2L, 10L, ts("2024-01-01 00:00:00")), // before any order -> null right
      (3L, 99L, ts("2024-01-05 00:00:00"))  // key with no right rows -> null right
    ).toDF("eid", "key", "t")
    val right = Seq(
      (100L, 10L, ts("2024-01-02 00:00:00")),
      (101L, 10L, ts("2024-01-04 00:00:00"))
    ).toDF("oid", "okey", "ot")

    val outerOut = AsOfMergeJoin
      .asOfMerge(left, right, "key", "okey", "t", "ot", Seq("oid"), outer = true)
      .select("eid", "oid").as[(Long, Option[Long])].collect().toMap
    assert(outerOut.size === 3, "outer as-of must keep every left row")
    assert(outerOut(1L) === Some(101L))
    assert(outerOut(2L) === None)
    assert(outerOut(3L) === None)

    val innerOut = AsOfMergeJoin
      .asOfMerge(left, right, "key", "okey", "t", "ot", Seq("oid"))
      .select("eid", "oid").as[(Long, Long)].collect().toMap
    assert(outerOut.collect { case (k, Some(v)) => k -> v } === innerOut,
      "outer's matched subset must equal the inner result")
  }

  test("asOfMerge: repartitioned inputs give identical results (distribution contract)") {
    import graft.plans.AsOfMergeJoin
    val left = (0 until 100).map(i => (i.toLong, (i % 5).toLong, ts(f"2024-01-${1 + i % 28}%02d 00:00:00")))
      .toDF("eid", "key", "t")
    val right = (0 until 80).map(i => (i.toLong, (i % 7).toLong, ts(f"2024-01-${1 + i % 28}%02d 00:00:00")))
      .toDF("oid", "okey", "ot")
    val a = AsOfMergeJoin.asOfMerge(left, right, "key", "okey", "t", "ot", Seq("oid"))
      .select("eid", "oid").as[(Long, Long)].collect().sorted.toSeq
    val b = AsOfMergeJoin.asOfMerge(left.repartition(13), right.repartition(3), "key", "okey", "t", "ot", Seq("oid"))
      .select("eid", "oid").as[(Long, Long)].collect().sorted.toSeq
    assert(a === b)
  }
}
