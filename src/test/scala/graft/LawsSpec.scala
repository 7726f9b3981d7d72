package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Algebraic laws (SURVEY.md §5.2.3) checked over ScalaCheck-generated
  * datasets, driven by explicit seeds (the scalatest↔scalacheck bridge
  * artifact is not on the offline classpath, so generation is manual). */
class LawsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, rng.Seed(42L + i)))

  private val rowsGen: Gen[List[(Long, Double)]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(0L, 20L), Gen.choose(-100.0, 100.0)))

  test("filter fusion: filter(p).filter(q) == filter(p && q)") {
    samples(rowsGen, 5).foreach { rows =>
      val df = rows.toDF("k", "v")
      val a  = df.filter(col("v") > 0).filter(col("k") % 2 === 0).collect().toSet
      val b  = df.filter(col("v") > 0 && col("k") % 2 === 0).collect().toSet
      assert(a === b)
    }
  }

  test("union row-count additivity (bag semantics)") {
    val gs = samples(rowsGen, 6)
    gs.grouped(2).foreach { case Seq(r1, r2) =>
      val a = r1.toDF("k", "v")
      val b = r2.toDF("k", "v")
      assert(a.union(b).count() === a.count() + b.count())
    }
  }

  test("dedup idempotence: exact(exact(x)) == exact(x)") {
    val texts = Gen.listOfN(30, Gen.oneOf("aa", "bb", "cc", "dd"))
    samples(texts, 5).foreach { rows =>
      val df    = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once  = Dedup.exact(df, col("text"), col("doc_id"))
      val twice = Dedup.exact(once.drop("content_hash"), col("text"), col("doc_id"))
      assert(once.select("doc_id").collect().toSet === twice.select("doc_id").collect().toSet)
    }
  }

  test("intersect/except partition: A∩B and A∖B cover A's distinct rows") {
    val gs = samples(rowsGen, 6)
    gs.grouped(2).foreach { case Seq(r1, r2) =>
      val a = r1.toDF("k", "v").select("k").distinct()
      val b = r2.toDF("k", "v").select("k").distinct()
      assert(a.intersect(b).count() + a.except(b).count() === a.count())
    }
  }
}
