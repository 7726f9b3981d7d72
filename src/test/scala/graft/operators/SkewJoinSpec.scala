package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join returns exactly the rows of the plain join, under skew") {
    // 90% of left rows share one hot key
    val left  = (1 to 1000).map(i => (if (i <= 900) 7L else i.toLong % 50, i.toLong)).toDF("k", "lv")
    val right = (0 to 49).map(i => (i.toLong, s"dim$i")).toDF("rk", "rv")

    val plain  = left.join(right, col("k") === col("rk")).select("k", "lv", "rv")
    val salted = SkewJoin
      .saltedInnerJoin(left, right, col("k"), col("rk"), factor = 8)
      .select("k", "lv", "rv")

    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(salted).count() === 0L)
  }

  test("salt splits the hot key across multiple shuffle partitions") {
    val left  = (1 to 1000).map(i => (7L, i.toLong)).toDF("k", "lv")
    val right = Seq((7L, "hot")).toDF("rk", "rv")
    val salted = SkewJoin.saltedInnerJoin(left, right, col("k"), col("rk"), factor = 4)
    // the join key now includes __salt → >1 distinct shuffle key for k=7
    val saltCards = left
      .withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(4L)))
      .select("__salt").distinct().count()
    assert(saltCards > 1, "salt degenerated to a single value")
    assert(salted.count() === 1000L)
  }
}
