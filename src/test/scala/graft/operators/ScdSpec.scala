package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1704067200000L + min * 60000L)

  private def log(rows: (Long, Int, String, Long)*) =
    rows.toSeq.toDF("user_id", "m", "state", "eid")
      .select(col("user_id"), expr("timestamp_millis(1704067200000 + m * 60000)").as("ts"),
        col("state"), col("eid"))

  private def hist(df: org.apache.spark.sql.DataFrame) =
    Scd.history(df, col("user_id"), col("ts"), col("state"), col("eid"))

  test("consecutive identical states collapse into one version") {
    val events = log(
      (1L, 0, "bronze", 1L), (1L, 5, "bronze", 2L), (1L, 10, "silver", 3L),
      (1L, 15, "silver", 4L), (1L, 20, "gold", 5L),
      (2L, 0, "bronze", 6L))
    val got = hist(events)
      .select(col("key"), col("state"), col("valid_from"), col("valid_to"), col("version"),
        col("is_current"))
      .as[(Long, String, Timestamp, Option[Timestamp], Long, Boolean)]
      .collect()
      .sortBy(r => (r._1, r._5))
    assert(got === Seq(
      (1L, "bronze", ts(0), Some(ts(10)), 1L, false),
      (1L, "silver", ts(10), Some(ts(20)), 2L, false),
      (1L, "gold", ts(20), None, 3L, true),
      (2L, "bronze", ts(0), None, 1L, true)))
  }

  test("a state can recur non-consecutively and opens a NEW version") {
    val got = hist(log((7L, 0, "a", 1L), (7L, 1, "b", 2L), (7L, 2, "a", 3L)))
      .select(col("state"), col("version"))
      .as[(String, Long)]
      .collect()
      .sortBy(_._2)
    assert(got === Seq(("a", 1L), ("b", 2L), ("a", 3L)))
  }

  test("timestamp ties break on the tie column, deterministically") {
    val got = hist(log((9L, 5, "x", 20L), (9L, 5, "y", 10L)))
      .select(col("state"), col("version"), col("is_current"))
      .as[(String, Long, Boolean)]
      .collect()
      .sortBy(_._2)
    // eid 10 ("y") sorts first: y then x; y's interval is zero-length.
    assert(got === Seq(("y", 1L, false), ("x", 2L, true)))
  }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, rng.Seed(4211L + i)))

  // Unique (user, minute) per log so point-in-time laws are unambiguous.
  private val logGen: Gen[List[(Long, Int, String)]] =
    Gen.listOfN(
      60,
      Gen.zip(Gen.choose(1L, 6L), Gen.choose(0, 500), Gen.oneOf("a", "b", "c")))
      .map(_.distinctBy(r => (r._1, r._2)))

  private def withIds(rows: Seq[(Long, Int, String)]) =
    rows.zipWithIndex.map { case ((u, m, s), i) => (u, m, s, i.toLong) }

  test("law: intervals tile the key's timeline — valid_to chains to the next valid_from") {
    samples(logGen, 5).foreach { rows =>
      val h = hist(log(withIds(rows): _*))
        .select(col("key"), col("valid_from"), col("valid_to"), col("version"), col("state"))
        .as[(Long, Timestamp, Option[Timestamp], Long, String)]
        .collect()
        .groupBy(_._1)
      h.values.foreach { runs =>
        val sorted = runs.sortBy(_._4)
        assert(sorted.map(_._4).toSeq === (1L to sorted.length).toSeq, "versions not consecutive")
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._3.contains(b._2), s"valid_to ${a._3} != next valid_from ${b._2}")
            assert(a._5 !== b._5, "consecutive runs share a state — not collapsed")
          case _ =>
        }
        assert(sorted.last._3.isEmpty, "last run must be open")
      }
    }
  }

  test("law: every observation falls in exactly one interval, carrying its own state") {
    samples(logGen, 5).foreach { rows =>
      val obs = log(withIds(rows): _*)
      val h   = hist(obs).withColumnRenamed("state", "h_state")
      val joined = obs.join(
        h,
        obs("user_id") === h("key")
          && h("valid_from") <= obs("ts")
          && (h("valid_to").isNull || h("valid_to") > obs("ts")))
      assert(joined.count() === rows.size.toLong, "intervals must tile: exactly one match per row")
      assert(joined.filter(col("state") =!= col("h_state")).count() === 0L,
        "interval state must equal the observed state")
    }
  }

  test("law: history is partitioning and input-order invariant") {
    samples(logGen, 3).foreach { rows =>
      val a = log(withIds(rows): _*)
      val b = log(withIds(rows).reverse: _*).repartition(7)
      val ha = hist(a).collect().map(_.toSeq).toSet
      val hb = hist(b).collect().map(_.toSeq).toSet
      assert(ha === hb)
    }
  }
}
