package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KCoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(edges: Seq[(Long, Long)]): DataFrame = edges.toDF("a", "b")

  private def run(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    KCore.kCore(df(edges), col("a"), col("b"), k).as[(Long, Long)].collect().toMap

  /** Brute-force reference peeling (the fixpoint is unique, so any
    * removal order reaches the same core). */
  private def refKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var e = edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .filter { case (x, y) => x != y }.distinct
    var changed = true
    while (changed) {
      val deg = e.flatMap { case (x, y) => Seq(x, y) }.groupBy(identity).map { case (n, l) => (n, l.size) }
      val bad = deg.filter(_._2 < k).keySet
      changed = bad.nonEmpty
      if (changed) e = e.filter { case (x, y) => !bad(x) && !bad(y) }
    }
    e.flatMap { case (x, y) => Seq(x, y) }.groupBy(identity).map { case (n, l) => (n, l.size) }
  }

  test("triangle with a tail: the 2-core is exactly the triangle") {
    val r = run(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)), 2)
    assert(r === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("k=1 keeps every non-isolated node; chain has empty 2-core") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(chain, 1).keySet === Set(1L, 2L, 3L, 4L))
    assert(run(chain, 2).isEmpty)
  }

  test("K5: every node survives k=4 with degree 4; k=5 empties it") {
    val nodes = (1L to 5L)
    val edges = for { a <- nodes; b <- nodes if a < b } yield (a, b)
    assert(run(edges.toSeq, 4) === nodes.map(_ -> 4L).toMap)
    assert(run(edges.toSeq, 5).isEmpty)
  }

  test("definition + maximality vs brute-force reference on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4; k <- Seq(2, 3)) {
      val n = 14 + trial
      val edges = (for {
        a <- 0L until n
        b <- (a + 1) until n
        if rnd.nextDouble() < 0.25
      } yield (a, b)).toSeq
      val got = run(edges, k)
      val ref = refKCore(edges, k)
      assert(got === ref.map { case (x, d) => (x, d.toLong) }, s"trial $trial k=$k")
      // definition: every surviving node keeps >= k neighbors inside the core
      got.foreach { case (_, d) => assert(d >= k) }
    }
  }

  test("deterministic under repartitioning") {
    val rnd = new scala.util.Random(5)
    val edges = (for {
      a <- 0L until 20L; b <- (a + 1) until 20L if rnd.nextDouble() < 0.2
    } yield (a, b)).toSeq
    val x = run(edges, 2)
    val y = KCore.kCore(df(edges).repartition(7), col("a"), col("b"), 2)
      .as[(Long, Long)].collect().toMap
    assert(x === y)
  }

  test("empty edge set: empty core, no failure") {
    assert(run(Seq.empty, 2) === Map.empty)
  }

  test("non-convergence guard throws instead of returning a half-peeled graph") {
    // a 30-node chain peels one layer per round from each end: needs ~15
    // rounds; cap at 3 must throw.
    val chain = (0L until 30L).sliding(2).map(s => (s.head, s.last)).toSeq
    intercept[IllegalStateException] {
      KCore.kCore(df(chain), col("a"), col("b"), 2, maxRounds = 3).collect()
    }
  }

  test("default round bound survives a long chain (the O(n)-rounds worst case)") {
    // a 240-node path needs ~120 peel rounds for k=2 — over the old
    // default of 100 (ADVICE r11); the raised default must converge to
    // the correct answer: a chain has no 2-core at all
    val chain = (0L until 240L).sliding(2).map(s => (s.head, s.last)).toSeq
    assert(run(chain, 2) === Map.empty)
  }
}
