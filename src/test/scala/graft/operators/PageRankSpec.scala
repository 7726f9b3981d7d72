package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int = 20): Map[Long, Double] =
    PageRank
      .run(edges.toDF("s", "d"), col("s"), col("d"), iterations = iters)
      .as[(Long, Double)]
      .collect()
      .toMap

  test("cycle graph: uniform ranks, exactly 1.0 each") {
    val r = ranksOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(r.size === 4)
    r.values.foreach(v => assert(math.abs(v - 1.0) < 1e-12, r))
  }

  test("star graph: dangling center redistributes; center outranks leaves; mass = n") {
    // 1..4 -> 0; 0 has no out-edges (dangling).
    val r = ranksOf((1L to 4L).map(i => (i, 0L)))
    assert(r(0L) > r(1L), r)
    assert(math.abs(r.values.sum - 5.0) < 1e-9, s"mass not conserved: ${r.values.sum}")
    // leaves are symmetric
    assert((2L to 4L).forall(i => r(i) === r(1L)))
  }

  test("rank mass is conserved on an asymmetric graph") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (5L, 5L))
    val r = ranksOf(edges)
    assert(math.abs(r.values.sum - 5.0) < 1e-9, s"sum=${r.values.sum}")
    assert(r(3L) > r(4L), "hub should outrank a pure source")
  }

  test("partitioning independence: decimal contribution sums make ranks bit-identical") {
    val edges = (0L until 60L).map(i => (i, (i * 7 + 3) % 60)) ++ Seq((0L, 30L), (30L, 0L))
    val df1 = edges.toDF("s", "d").repartition(1)
    val df8 = edges.toDF("s", "d").repartition(8, col("d"))
    val r1 = PageRank.run(df1, col("s"), col("d"), iterations = 8)
      .as[(Long, Double)].collect().toMap
    val r8 = PageRank.run(df8, col("s"), col("d"), iterations = 8)
      .as[(Long, Double)].collect().toMap
    assert(r1 === r8)
  }
}
