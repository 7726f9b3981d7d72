package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Laws for the whole-vector aggregators (functions/VectorAgg.scala):
  * equivalence to the exploded groupBy-sum plans they replace (bit-exact,
  * partitioning-independent), 126-bit-exact square sums vs a BigInteger
  * reference, quantizer parity with the scalar micro-grid expression, and
  * defensive behavior (mixed dims refuse, nulls skip, overflow throws). */
class VectorAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(17)
  private val dim = 7
  private def randRows(n: Int): Seq[(Long, Array[Long])] =
    (1 to n).map(i =>
      ((i % 4).toLong, Array.fill(dim)(rnd.nextLong() % 1000000000L)))

  test("sumLong ≡ the exploded groupBy-sum, bit-exact under any partitioning") {
    val rows = randRows(500)
    val df   = rows.toDF("g", "v")
    def viaAgg(parts: Int): Map[Long, Seq[Long]] = df
      .repartition(parts)
      .groupBy("g").agg(VectorAgg.sumLong(col("v")).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    val exploded = df
      .select(col("g"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("g", "pos").agg(sum("x").as("s"))
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(viaAgg(1) === exploded)
    assert(viaAgg(13) === exploded)
  }

  test("sumSquares ≡ BigInteger reference via squaresToDecimal, any partitioning") {
    val rows = randRows(300)
    val ref: Map[Long, Seq[BigInt]] = rows
      .groupBy(_._1).view.mapValues { grp =>
        (0 until dim).map(i => grp.map(r => BigInt(r._2(i)) * BigInt(r._2(i))).sum)
      }.toMap
    Seq(1, 11).foreach { parts =>
      val got = rows.toDF("g", "v")
        .repartition(parts)
        .groupBy("g").agg(VectorAgg.sumSquares(col("v")).as("limbs"))
        .select(col("g"), posexplode(expr(s"sequence(0, ${dim - 1})")).as(Seq("i", "pos")),
          col("limbs"))
        .select(col("g"), col("pos"),
          VectorAgg.squaresToDecimal(col("limbs"), col("pos")).cast("string").as("ss"))
        .as[(Long, Int, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => BigInt(r._3)).toSeq).toMap
      assert(got === ref, s"square sums diverged at $parts partitions")
    }
  }

  test("quantizeNano ≡ the scalar micro-grid expression component-wise") {
    val xs = Seq(0.0, -0.0, 1.0, -1.0, 0.1234567891, -0.9999999999, 2.5e-10, -2.5e-10)
    val got = Seq(Tuple1(xs.toArray)).toDF("v")
      .select(VectorAgg.quantizeNano(col("v")).as("q"))
      .as[Seq[Long]].head()
    val want = xs.map(x => (math.signum(x) * math.floor(math.abs(x) * 1e9)).toLong)
    assert(got === want)
  }

  test("mixed dimensions refuse; null vectors and empty groups are skipped") {
    val bad = Seq((1L, Array(1L, 2L)), (1L, Array(1L, 2L, 3L))).toDF("g", "v")
    val e = intercept[Exception] {
      bad.groupBy("g").agg(VectorAgg.sumLong(col("v"))).collect()
    }
    assert(e.getMessage != null)
    val withNull = Seq((1L, Some(Array(1L, 2L))), (1L, None), (2L, None))
      .toDF("g", "v")
      .groupBy("g").agg(VectorAgg.sumLong(col("v")).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(withNull(1L) === Seq(1L, 2L), "null vector corrupted the sum")
    assert(withNull(2L) === Seq.empty, "all-null group should finish empty")
  }

  test("long overflow throws (ANSI parity), never wraps silently") {
    val big = Seq((1L, Array(Long.MaxValue - 1)), (1L, Array(2L))).toDF("g", "v")
    intercept[Exception] {
      big.groupBy("g").agg(VectorAgg.sumLong(col("v"))).collect()
    }
  }

  test("sumSquares stays exact for near-max components (|x| up to ~3.03 nano-quantized)") {
    // sq of 3037000499 is ~9.22e18: folding it onto a near-full lo limb
    // overflowed Long before the limb-split fix. Exercise the whole
    // (2.87, 3.04] window plus repeats of the max component.
    val comps = Seq(3037000499L, -3037000499L, 2900000001L, 3000000000L,
      2870000001L, 3037000499L, 3037000499L, 1L)
    val rows  = comps.map(c => (1L, Array(c)))
    val ref   = comps.map(c => BigInt(c) * BigInt(c)).sum
    Seq(1, 5).foreach { parts =>
      val got = rows.toDF("g", "v")
        .repartition(parts)
        .groupBy("g").agg(VectorAgg.sumSquares(col("v")).as("limbs"))
        .select(VectorAgg.squaresToDecimal(col("limbs"), lit(0)).cast("string").as("ss"))
        .as[String].head()
      assert(BigInt(got) === ref, s"near-max square sum diverged at $parts partitions")
    }
  }

  test("maxDouble treats NaN as greatest regardless of arrival order / partitioning") {
    val rows = Seq((1L, Array(1.0, 5.0)), (1L, Array(Double.NaN, 2.0)), (1L, Array(3.0, 4.0)))
    Seq(1, 3).foreach { parts =>
      val got = rows.toDF("g", "v")
        .repartition(parts)
        .groupBy("g").agg(VectorAgg.maxDouble(col("v")).as("m"))
        .as[(Long, Seq[Double])].head()._2
      assert(got(0).isNaN, s"NaN lost at $parts partitions")
      assert(got(1) === 5.0)
    }
  }
}
