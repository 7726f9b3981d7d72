package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(edges: Seq[(Long, Long)]): DataFrame = edges.toDF("a", "b")

  private def naiveTriangleCount(edges: Seq[(Long, Long)]): Long = {
    // id-ordered 3-way join on the canonical a<b edge set — the oracle
    // formulation, quadratic under skew, fine for test graphs.
    val e = edges
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }
      .toSet
    val byA = e.groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
    e.iterator.map { case (a, b) =>
      byA.getOrElse(b, Set.empty).count(c => e.contains((a, c)))
    }.sum
  }

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles
      .perNodeCounts(df(edges), col("a"), col("b"))
      .as[(Long, Long)]
      .collect()
      .toMap

  test("single triangle: every node counts 1") {
    val r = counts(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangle-free path graph: zero-filled rows for every edged node") {
    val r = counts(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(r === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("K4: four triangles, each node in exactly three") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val edges = for { a <- nodes; b <- nodes if a < b } yield (a, b)
    val tri   = Triangles.triangles(df(edges), col("a"), col("b")).count()
    assert(tri === 4L)
    assert(counts(edges) === nodes.map(_ -> 3L).toMap)
  }

  test("star hub produces zero wedges: hub counts 0, no fan-out blow-up") {
    val edges = (1L to 50L).map(i => (0L, i))
    val r     = counts(edges)
    assert(r(0L) === 0L)
    assert(r.values.forall(_ == 0L))
  }

  test("duplicate / reversed / self-loop edges canonicalize away") {
    val r = counts(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L)))
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("random graphs: degree-ordered count ≡ naive count, Σ per-node = 3·triangles") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 12 + trial
      val edges = (for {
        a <- 0L until n
        b <- (a + 1) until n
        if rnd.nextDouble() < 0.3
      } yield (a, b)).toSeq
      val expected = naiveTriangleCount(edges)
      val tri      = Triangles.triangles(df(edges), col("a"), col("b")).count()
      val perNode  = counts(edges)
      assert(tri === expected, s"trial $trial")
      assert(perNode.values.sum === 3 * expected, s"trial $trial")
    }
  }

  test("empty and self-loop-only edge sets produce empty output, no failure") {
    assert(counts(Seq.empty) === Map.empty)
    assert(counts(Seq((1L, 1L), (2L, 2L))) === Map.empty)
    assert(Triangles.triangles(df(Seq.empty), col("a"), col("b")).count() === 0L)
  }

  test("each triangle emitted once, with rank-ordered endpoints distinct") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L), (1L, 4L))
    val tri = Triangles.triangles(df(edges), col("a"), col("b"))
      .as[(Long, Long, Long)].collect()
    assert(tri.length === tri.distinct.length)
    tri.foreach { case (x, y, z) => assert(Set(x, y, z).size === 3) }
  }
}
