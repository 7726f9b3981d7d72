package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IvmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keys = Seq("k")

  private def log(rows: (String, Double, Long)*): DataFrame =
    rows.toSeq.toDF("k", "v", "op")

  private def state(df: DataFrame): DataFrame =
    Ivm.aggDelta(df, col("op"), col("v"), keys)

  private def collectView(st: DataFrame): Set[(String, Long, Double, Double)] =
    Ivm.view(st, keys).as[(String, Long, Double, Double)].collect().toSet

  test("insert/update/delete hand case: retract+insert updates, zero-weight keys vanish") {
    val base  = log(("a", 10.0, 1L), ("a", 20.0, 1L), ("b", 5.0, 1L), ("c", 7.0, 1L))
    val delta = log(
      ("a", 20.0, -1L), ("a", 25.0, 1L), // update a's 20 → 25
      ("b", 2.0, 1L),                    // plain insert
      ("c", 7.0, -1L))                   // full retraction of c
    val got = collectView(Ivm.applyDelta(state(base), state(delta), keys))
    assert(got === Set(
      ("a", 2L, 35.0, 17.5),
      ("b", 2L, 7.0, 3.5)))
  }

  test("weighted ops: op carries multiplicity, not just sign") {
    val got = collectView(state(log(("x", 3.0, 5L), ("x", 3.0, -2L))))
    assert(got === Set(("x", 3L, 9.0, 3.0)))
  }

  test("auditZeros flags a retraction that never matched its insert") {
    val base  = log(("a", 10.0, 1L))
    val bad   = log(("a", 11.0, -1L)) // retracts a value never inserted
    val flags = Ivm.auditZeros(state(base), state(bad), keys).count()
    assert(flags === 1L)
    val clean = Ivm.auditZeros(state(base), state(log(("a", 10.0, -1L))), keys).count()
    assert(clean === 0L)
  }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, rng.Seed(5711L + i)))

  // Consistent changelogs: inserts with values drawn from a small grid so
  // retractions (generated as negations of a prefix) always match an
  // insert within the same multiset.
  private val insGen: Gen[List[(String, Double, Long)]] =
    Gen.listOfN(
      40,
      Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.choose(1, 9).map(_ * 1.25), Gen.const(1L)))

  test("law: incremental ≡ recompute — merging batch states equals the one-shot state") {
    samples(insGen, 5).foreach { rows =>
      val (b1, b2) = rows.splitAt(rows.size / 2)
      // retract a deterministic third of batch 1 inside batch 2
      val retr  = b1.zipWithIndex.collect { case ((k, v, _), i) if i % 3 == 0 => (k, v, -1L) }
      val whole = state(log(rows ++ retr: _*))
      val incr  = Ivm.applyDelta(state(log(b1: _*)), state(log(b2 ++ retr: _*)), keys)
      assert(collectView(incr) === collectView(whole))
    }
  }

  test("law: merge is associative and commutative over batches") {
    samples(insGen, 3).foreach { rows =>
      val (b1, rest) = rows.splitAt(rows.size / 3)
      val (b2, b3)   = rest.splitAt(rest.size / 2)
      val left  = Ivm.applyDelta(Ivm.applyDelta(state(log(b1: _*)), state(log(b2: _*)), keys), state(log(b3: _*)), keys)
      val right = Ivm.applyDelta(state(log(b3: _*)), Ivm.applyDelta(state(log(b2: _*)), state(log(b1: _*)), keys), keys)
      assert(collectView(left) === collectView(right))
    }
  }

  test("law: retracting everything leaves an empty view") {
    samples(insGen, 3).foreach { rows =>
      val undo  = rows.map { case (k, v, _) => (k, v, -1L) }
      val merged = Ivm.applyDelta(state(log(rows: _*)), state(log(undo: _*)), keys)
      assert(merged.count() === 0L)
    }
  }
}
