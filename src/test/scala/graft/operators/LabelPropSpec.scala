package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LabelPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(rows: (Long, Long)*) = rows.toSeq.toDF("src", "dst")
  private def seeds(rows: (Long, String)*) = rows.toSeq.toDF("node", "label")

  private def runMap(e: org.apache.spark.sql.DataFrame, s: org.apache.spark.sql.DataFrame, r: Int) =
    LabelProp.run(e, s, r).as[(Long, Option[String])].collect().toMap

  test("single seed floods its whole component; other components stay unlabeled") {
    // Component A: 1-2-3-4 chain, seed at 1. Component B: 10-11, unseeded.
    val got = runMap(edges((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)), seeds((1L, "good")), 5)
    assert(got(1L) === Some("good") && got(2L) === Some("good"))
    assert(got(3L) === Some("good") && got(4L) === Some("good"))
    assert(got(10L) === None && got(11L) === None)
  }

  test("seeds are pinned even under contrary majority") {
    // Seed 5 = "a" surrounded by three "b" seeds — 5 must keep "a".
    val got = runMap(
      edges((5L, 6L), (5L, 7L), (5L, 8L)),
      seeds((5L, "a"), (6L, "b"), (7L, "b"), (8L, "b")), 4)
    assert(got(5L) === Some("a"))
  }

  test("majority vote wins; ties break to the smallest label") {
    // 0 has neighbors: two labeled "z", two labeled "m" → tie → "m".
    // 9 has neighbors: two "z", one "m" → majority "z".
    val e = edges((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (9L, 1L), (9L, 2L), (9L, 3L))
    val s = seeds((1L, "z"), (2L, "z"), (3L, "m"), (4L, "m"))
    val got = runMap(e, s, 1)
    assert(got(0L) === Some("m"), "4-way tie must break to the lexicographically smallest label")
    assert(got(9L) === Some("z"))
  }

  test("spread is one hop per round (synchronous semantics)") {
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L))
    val s = seeds((1L, "x"))
    assert(runMap(e, s, 1)(3L) === None)
    assert(runMap(e, s, 2)(3L) === Some("x"))
    assert(runMap(e, s, 2)(4L) === None)
    assert(runMap(e, s, 3)(4L) === Some("x"))
  }

  test("labels come only from the seed label set; result invariant under repartition") {
    val rnd = new scala.util.Random(11)
    val e = edges((0 until 120).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)): _*)
    val s = seeds((0L, "s0"), (13L, "s1"), (27L, "s2"))
    val a = LabelProp.run(e, s, 4).orderBy("node").collect().toSeq
    val b = LabelProp.run(e.repartition(17), s.repartition(3), 4).orderBy("node").collect().toSeq
    assert(a === b)
    val labels = a.flatMap(r => Option(r.getString(1))).toSet
    assert(labels.subsetOf(Set("s0", "s1", "s2")))
  }
}
