package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorOps

class ProcrustesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8

  // Deterministic full-rank sample: one burned-in generator per row (a
  // pure sinusoid family is rank-3 in r and trips the singularity guard —
  // which is exactly what the guard is for; and sequential java.util.Random
  // seeds correlate on their FIRST draw, so burn one).
  private def xs(n: Int) =
    (0 until n).map { r =>
      val rnd = new scala.util.Random(r)
      rnd.nextDouble()
      (r.toLong, Array.fill(dim)(rnd.nextDouble() - 0.5))
    }.toDF("id", "x")

  // Planted orthogonal map: reverse dims, alternate signs (a signed
  // permutation — orthogonal by construction).
  private def planted(x: Array[Double]): Array[Double] =
    Array.tabulate(dim)(j => (if (j % 2 == 0) 1.0 else -1.0) * x(dim - 1 - j))

  private def pairs(n: Int) = {
    val p = udf((x: Seq[Double]) => planted(x.toArray))
    xs(n).withColumn("y", p(col("x")))
  }

  test("fit recovers a planted signed permutation; W is orthogonal") {
    val w = Procrustes.fitOrthogonal(pairs(200), col("x"), col("y"), dim)
    // Recovery: W ≈ Pᵀ where y_row = x_row · Pᵀ.
    for (i <- 0 until dim; j <- 0 until dim) {
      val expect = if (i == dim - 1 - j) (if (j % 2 == 0) 1.0 else -1.0) else 0.0
      assert(math.abs(w(i)(j) - expect) < 1e-6, s"W($i)($j)=${w(i)(j)} expected $expect")
    }
    // Orthogonality: WᵀW = I.
    for (a <- 0 until dim; b <- 0 until dim) {
      val dot = (0 until dim).map(k => w(k)(a) * w(k)(b)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-6)
    }
  }

  test("align(x, W) reproduces y to numerical precision") {
    val p = pairs(100)
    val w = Procrustes.fitOrthogonal(p, col("x"), col("y"), dim)
    val got = Procrustes
      .align(p, col("id"), col("x"), w)
      .join(p.select(col("id"), col("y")), "id")
      .select(max(abs(expr("aggregate(zip_with(aligned, y, (a, b) -> abs(a - b)), 0D, (m, v) -> greatest(m, v))"))))
      .head()
      .getDouble(0)
    assert(got < 1e-6, s"max elementwise alignment error $got")
  }

  test("fit is bit-identical under repartitioning (decimal-exact cross-covariance)") {
    val p = pairs(150)
    val a = Procrustes.fitOrthogonal(p, col("x"), col("y"), dim)
    val b = Procrustes.fitOrthogonal(p.repartition(13), col("x"), col("y"), dim)
    for (i <- 0 until dim; j <- 0 until dim)
      assert(a(i)(j) == b(i)(j), s"W($i)($j) differs across partitionings")
  }

  test("refuses rank-deficient pairings loudly") {
    // All mass in dim 0 → MᵀM singular → identifiability error, not junk.
    val degenerate = (0 until 50)
      .map(r => (r.toLong, Array.tabulate(dim)(c => if (c == 0) r + 1.0 else 0.0)))
      .toDF("id", "x")
      .withColumn("y", col("x"))
    val e = intercept[IllegalArgumentException] {
      Procrustes.fitOrthogonal(degenerate, col("x"), col("y"), dim)
    }
    assert(e.getMessage.contains("singular"))
  }

  test("registered d3_procrustes_align recovers the signed reversal on the fixture") {
    val rows = graft.SparkEntry
      .queries("d3_procrustes_align")(spark, TestSpark.sf0001)
      .as[(Long, Long, Double)]
      .collect()
    assert(rows.length === 64)
    rows.foreach { case (i, j, w) =>
      assert(j === 63 - i, s"dim $i mapped to $j, expected ${63 - i}")
      val sign = if (j % 2 == 0) 1.0 else -1.0
      assert(math.abs(w - sign) < 1e-5, s"weight $w at ($i,$j), expected $sign")
    }
  }
}
