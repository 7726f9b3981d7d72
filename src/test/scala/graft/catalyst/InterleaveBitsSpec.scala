package graft.catalyst

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.ZOrder

/** Morton-key expression laws: agreement with a naive per-bit reference,
  * null semantics, Z-locality (the property file skipping rests on), and
  * the SQL registration path. */
class InterleaveBitsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Naive bit-by-bit interleave — the definitional reference. */
  private def naive(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("expression matches the bit-by-bit definition (codegen path, via DataFrame)") {
    val rows = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (12345L, 67890L), (2147483647L, 2147483647L),
      ((1L << 31) + 5L, 3L) // bit 31+ masked off: same as (5, 3)
    ).toDF("x", "y")
    val got = rows
      .select(col("x"), col("y"), ZOrder.interleaveBits(spark, col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z === naive(x & 0x7FFFFFFFL, y & 0x7FFFFFFFL), s"($x, $y)")
      assert(z >= 0L, "31-bit inputs must keep the key positive")
    }
  }

  test("interpreted eval agrees with the generated code and the SQL registration") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interp = InterleaveBitsExpression(Literal(12345L), Literal(67890L)).eval(null)
    assert(interp === naive(12345L, 67890L))
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT graft_interleave_bits(12345L, 67890L) AS z")
      .as[Long].collect().head
    assert(viaSql === naive(12345L, 67890L))
    // null in → null out
    assert(spark.sql("SELECT graft_interleave_bits(CAST(NULL AS BIGINT), 1L)").collect().head.isNullAt(0))
  }

  test("the generated oracle SQL is the same function (DuckDB-portable arithmetic)") {
    // Run the ANSI twin THROUGH SPARK: identical values proves the
    // mask-and-shift SQL encodes the same function; c18_zorder's DuckDB
    // run proves cross-engine portability.
    val sqlExpr = InterleaveBitsExpression.oracleSql("x", "y")
    val rows = Seq((12345L, 67890L), (0L, 2147483647L), (999999937L, 42L)).toDF("x", "y")
    val twin = rows.selectExpr(s"$sqlExpr AS z").as[Long].collect()
    val native = rows
      .select(ZOrder.interleaveBits(spark, col("x"), col("y"))).as[Long].collect()
    assert(twin.toSeq === native.toSeq)
  }

  test("Z-locality: nearby points share key prefixes, far points do not") {
    // The clustering property: for points in a small rectangle, keys are
    // closer to each other than to points in a distant rectangle.
    val near  = for (dx <- 0L to 3L; dy <- 0L to 3L) yield naive(1000L + dx, 2000L + dy)
    val far   = naive(1000000L, 2000000L)
    val spanNear = near.max - near.min
    assert(spanNear < math.abs(far - near.min), "distant point not separated in key space")
  }

  test("morton3 matches the bit-by-bit definition; nulls propagate; interpreted ≡ codegen") {
    def naive3(x: Long, y: Long, z: Long): Long = {
      var out = 0L
      for (b <- 0 until 20) {
        out |= ((x >> b) & 1L) << (3 * b)
        out |= ((y >> b) & 1L) << (3 * b + 1)
        out |= ((z >> b) & 1L) << (3 * b + 2)
      }
      out
    }
    val rnd = new scala.util.Random(5)
    val rows = Seq((0L, 0L, 0L), (1L, 2L, 4L), ((1L << 20) - 1, (1L << 20) - 1, (1L << 20) - 1),
      ((1L << 20) + 9L, 1L, 2L)) ++ // bit 20+ masked
      (1 to 50).map(_ => (rnd.nextInt(1 << 20).toLong, rnd.nextInt(1 << 20).toLong, rnd.nextInt(1 << 20).toLong))
    val got = rows.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        ZOrder.morton3(spark, col("x"), col("y"), col("z")).as("m"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (x, y, z, m) =>
      val mask = (1L << 20) - 1
      assert(m === naive3(x & mask, y & mask, z & mask), s"($x, $y, $z)")
      assert(m >= 0L)
    }
    // null propagation
    val n = Seq((Some(1L), None: Option[Long], Some(2L))).toDF("x", "y", "z")
      .select(ZOrder.morton3(spark, col("x"), col("y"), col("z"))).collect()
    assert(n.head.isNullAt(0))
    // interpreted path
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interp = Morton3Expression(Literal(5L), Literal(3L), Literal(6L)).eval(null)
    assert(interp === naive3(5L, 3L, 6L))
    // oracle SQL twin computes the identical key on the Spark SQL engine
    val viaSql = spark.sql(
      s"SELECT ${Morton3Expression.oracleSql("5", "3", "6")} AS m")
      .as[Long].head()
    assert(viaSql === naive3(5L, 3L, 6L))
  }

  test("scaleToBits maps bounds to [0, 2^bits) and constants to 0") {
    val df = Seq(0L, 50L, 100L).toDF("v")
    val scaled = df.select(
      ZOrder.scaleToBits(col("v"), lit(0L), lit(100L), bits = 10).as("s"))
      .as[Long].collect().sorted
    assert(scaled.head === 0L && scaled.last === 1023L && scaled(1) === 511L)
    val const = df.select(ZOrder.scaleToBits(col("v"), lit(7L), lit(7L), 10).as("s"))
      .as[Long].collect()
    assert(const.forall(_ === 0L))
  }
}
