package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val HourMicros = 3600L * 1000000L

  private def sides: (DataFrame, DataFrame) = {
    val ev = graft.tables.Tables.events(spark, TestSpark.sf0001)
    val l = ev.select(
      col("event_id").as("l_id"), col("user_id").as("l_user"), col("ts").as("l_ts"))
    val r = ev.select(
      col("event_id").as("r_id"), col("user_id").as("r_user"), col("ts").as("r_ts"))
    (l, r)
  }

  private def key = col("l_user") === col("r_user") && col("l_id") =!= col("r_id")

  private def naiveInner: DataFrame = {
    val (l, r) = sides
    l.join(
      r,
      key && col("r_ts") >= col("l_ts") && col("r_ts") <= col("l_ts") + expr("INTERVAL 1 hour"))
  }

  test("bucketed inner interval join ≡ naive band-filtered join") {
    val (l, r) = sides
    val bucketed = IntervalJoin
      .inner(l, r, "l_ts", "r_ts", HourMicros, key)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val naive = naiveInner.select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(bucketed === naive,
      s"missing=${(naive -- bucketed).take(5)} extra=${(bucketed -- naive).take(5)}")
    assert(naive.nonEmpty, "fixture produced no interval matches — test is vacuous")
  }

  test("bucketed left-outer ≡ naive left-outer (matches + null-extended non-matches)") {
    val (l, r) = sides
    val bucketed = IntervalJoin
      .leftOuter(l, r, "l_ts", "r_ts", HourMicros, key, col("l_id"))
      .select(col("l_id"), col("r_id"))
      .as[(Long, Option[Long])].collect().toSet
    val naive = l
      .join(
        r,
        key && col("r_ts") >= col("l_ts") && col("r_ts") <= col("l_ts") + expr("INTERVAL 1 hour"),
        "left_outer")
      .select(col("l_id"), col("r_id"))
      .as[(Long, Option[Long])].collect().toSet
    assert(bucketed === naive)
    // Every left id appears; unmatched ones exactly once with a null right.
    val leftIds = l.select("l_id").as[Long].collect().toSet
    assert(bucketed.map(_._1) === leftIds)
  }

  test("window boundaries are inclusive and bucket-crossing pairs are found") {
    // r exactly at l.ts and exactly at l.ts + W both match; the W+1µs miss
    // doesn't. The 30-min offset match crosses a bucket boundary (l at
    // :45, r at :15 next hour) — the case single-bucket joining would lose.
    val l = Seq((1L, 100L, ts("2024-01-01 10:45:00"))).toDF("l_id", "l_user", "l_ts")
    val r = Seq(
      (10L, 100L, ts("2024-01-01 10:45:00")), // boundary: == l_ts
      (11L, 100L, ts("2024-01-01 11:15:00")), // crosses into the next bucket
      (12L, 100L, ts("2024-01-01 11:45:00")), // boundary: == l_ts + 1h
      (13L, 100L, ts("2024-01-01 11:45:00.000001")), // 1µs past the window
      (14L, 999L, ts("2024-01-01 11:00:00")) // wrong key
    ).toDF("r_id", "r_user", "r_ts")
    val got = IntervalJoin
      .inner(l, r, "l_ts", "r_ts", HourMicros, col("l_user") === col("r_user"))
      .select("r_id").as[Long].collect().toSet
    assert(got === Set(10L, 11L, 12L))
  }

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
}
