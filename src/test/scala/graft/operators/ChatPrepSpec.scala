package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ChatPrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, Int, Long, String)*) =
    rows.toSeq.toDF("conv", "m", "eid", "txt")
      .select(
        col("conv"),
        expr("timestamp_millis(1704067200000 + m * 60000)").as("ts"),
        col("eid"), col("txt"))

  private def run(df: org.apache.spark.sql.DataFrame) =
    ChatPrep.turns(df, col("conv"), col("ts"), col("eid"), col("txt"))

  test("roles alternate user/assistant in (ts, tie) order, starting at user") {
    val t = run(ev(
      (1L, 3, 30L, "c c"), (1L, 1, 10L, "a"), (1L, 2, 20L, "b b b"),
      (2L, 1, 11L, "x")))
      .select("conv_id", "turn_idx", "role", "n_tok")
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(t === Seq(
      (1L, 1L, "user", 5L),       // "a" = 1 tok + 4 overhead
      (1L, 2L, "assistant", 7L),  // "b b b" = 3 + 4
      (1L, 3L, "user", 6L),       // "c c" = 2 + 4
      (2L, 1L, "user", 5L)))
  }

  test("timestamp ties break on the tie column deterministically") {
    val t = run(ev((5L, 1, 2L, "late"), (5L, 1, 1L, "early")))
      .select("turn_idx", "turn_text").as[(Long, String)].collect().sortBy(_._1)
    assert(t === Seq((1L, "early"), (2L, "late")))
  }

  test("convStats: loss mask counts assistant turns only; loss ≤ total") {
    val stats = ChatPrep.convStats(run(ev(
      (1L, 1, 1L, "q q"), (1L, 2, 2L, "a a a a"), (1L, 3, 3L, "q"), (1L, 4, 4L, "a"))))
      .as[(Long, Long, Long, Long, Double)].collect()
    val (conv, nTurns, total, loss, frac) = stats.head
    assert(conv === 1L && nTurns === 4L)
    assert(total === (2 + 4) + (4 + 4) + (1 + 4) + (1 + 4))
    assert(loss === (4 + 4) + (1 + 4)) // turns 2 and 4
    assert(frac === math.round(loss.toDouble / total * 1e6) / 1e6)
    assert(loss <= total)
  }

  test("result is invariant under input partitioning") {
    val base = ev((1L to 40L).flatMap(c => (1 to 7).map(i => (c, i, c * 100 + i, s"w" * (i % 3 + 1)))): _*)
    val a = ChatPrep.convStats(run(base)).orderBy("conv_id").collect()
    val b = ChatPrep.convStats(run(base.repartition(13))).orderBy("conv_id").collect()
    assert(a.toSeq === b.toSeq)
  }
}
