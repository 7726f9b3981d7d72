package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RrfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def list(rows: (Long, Int)*) = rows.toDF("id", "rank")

  test("fused score is the exact micro-grid sum of 1/(60+rank)") {
    val a = list(10L -> 1, 11L -> 2)
    val b = list(11L -> 1, 12L -> 2)
    val out = Rrf
      .fuse(Seq(a, b))
      .as[(Long, Long, Long, Double)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    def g(r: Int): Long = math.round(1e12 / (60 + r))
    def exp(rs: Int*): Double = math.rint(rs.map(g).sum / 1e12 * 1e6) / 1e6
    assert(out(10L) === ((10L, 1L, 1L, exp(1))))
    assert(out(11L) === ((11L, 2L, 1L, exp(2, 1))))
    assert(out(12L) === ((12L, 1L, 2L, exp(2))))
    // The doc in both lists outranks every single-list doc here.
    assert(out(11L)._4 > out(10L)._4 && out(10L)._4 > out(12L)._4)
  }

  test("fusion is independent of input partitioning and list order") {
    val a = list((1L to 20L).map(i => i -> i.toInt): _*)
    val b = list((11L to 30L).map(i => i -> (31 - i).toInt): _*)
    val x = Rrf.fuse(Seq(a, b)).as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val y = Rrf
      .fuse(Seq(b.repartition(7), a.repartition(3)))
      .as[(Long, Long, Long, Double)]
      .collect()
      .sorted
      .toSeq
    assert(x === y)
  }

  test("rankList assigns dense 1-based ranks matching the top-k order") {
    val scored = Seq((5L, 0.9), (3L, 0.9), (8L, 0.7), (1L, 0.5))
      .toDF("doc_id", "score")
    val ranked = Rrf
      .rankList(scored.orderBy(col("score").desc, col("doc_id")).limit(3), "doc_id", "score")
      .as[(Long, Int)]
      .collect()
      .sortBy(_._2)
      .toList
    // Score ties break by id; only the top-3 survive the limit.
    assert(ranked === List(3L -> 1, 5L -> 2, 8L -> 3))
  }
}
