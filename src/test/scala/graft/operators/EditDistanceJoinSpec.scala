package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EditDistanceJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def strings(ss: Seq[String]): DataFrame =
    ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")

  /** Ground truth: unblocked all-pairs levenshtein (tiny inputs only). */
  private def naive(df: DataFrame, k: Int): Set[(Long, Long, Long)] = {
    val a = df.select(col("id").as("id_a"), col("s").as("s_a"))
    val b = df.select(col("id").as("id_b"), col("s").as("s_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("ed", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("ed") <= k)
      .select(col("id_a"), col("id_b"), col("ed"))
      .as[(Long, Long, Long)]
      .collect()
      .toSet
  }

  private def blocked(df: DataFrame, k: Int): Set[(Long, Long, Long)] =
    EditDistanceJoin
      .pairs(df, col("id"), col("s"), k)
      .as[(Long, Long, Long)]
      .collect()
      .toSet

  test("exact pairs on a hand case: typo variants in, distant strings out") {
    val df = strings(Seq(
      "the quick brown fox jumps",   // 0
      "the quick brown fox jump",    // 1: ed 1 to 0
      "the quikc brown fox jumps",   // 2: ed 2 to 0 (transposition = 2 edits)
      "a completely different text", // 3
      "the quick brown dog jumps"))  // 4: ed 2 to 0 (f→d, x→g; middle o matches)
    val got = blocked(df, 3)
    assert(got === naive(df, 3))
    assert(got.contains((0L, 1L, 1L)))
    assert(got.contains((0L, 2L, 2L)))
    assert(got.contains((0L, 4L, 2L)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, rng.Seed(2311L + i)))

  // Small alphabet + short lengths force collisions, degenerate segments,
  // and strings on both sides of the short-string threshold max(2(k+1), 8).
  private val corpusGen: Gen[List[String]] =
    Gen.listOfN(30, Gen.choose(0, 14).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c'))))

  test("law: blocked join ≡ naive all-pairs on random corpora (completeness + precision)") {
    for (k <- Seq(1, 2, 3)) {
      samples(corpusGen, 4).foreach { ss =>
        val df = strings(ss.distinct)
        assert(blocked(df, k) === naive(df, k), s"k=$k corpus=$ss")
      }
    }
  }

  test("repeated-segment stress: runs of one character (aligned-segment logic)") {
    val df = strings(Seq("aaaaaaaaaa", "aaaaaaaaab", "aaaaaaaa", "bbbbbbbbbb", "ab"))
    for (k <- Seq(1, 2, 3)) assert(blocked(df, k) === naive(df, k), s"k=$k")
  }

  test("empty and sub-q strings route through the short block") {
    val df = strings(Seq("", "a", "ab", "abc", "abcd", "zzzz"))
    for (k <- Seq(0, 1, 2)) assert(blocked(df, k) === naive(df, k), s"k=$k")
  }

  test("maxDist=0 degenerates to exact-duplicate pairs") {
    val df = strings(Seq("hello world", "hello world", "hello worlds", "other"))
    assert(blocked(df, 0) === Set((0L, 1L, 0L)))
  }
}
