package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Orthogonal Procrustes alignment between two embedding spaces (Schönemann
  * 1966) — the embedding-MODEL-MIGRATION operator: when a corpus re-embeds
  * under a new model, the rotation W = argmin‖XW − Y‖_F (WᵀW = I) maps
  * old-space vectors into the new space, so queries, centroids, and cached
  * neighbors keep working against a partially re-embedded index instead of
  * forcing a 100 TB full re-embed cutover.
  *
  * Split of labor (the Pca conventions exactly):
  *  - DATA-sized: the d×d cross-covariance M = XᵀY — per-partition JVM
  *    partials accumulated in BigDecimal with Spark's double→decimal cast
  *    semantics, so the fitted rotation is bit-identical under any
  *    partitioning; the shuffle carries partitions·d² decimal cells.
  *  - DIMENSION-sized: the polar decomposition W = M·(MᵀM)^(−1/2) runs on
  *    the driver via [[Pca.jacobiEigen]] on the symmetric d×d MᵀM —
  *    microseconds of config-bounded arithmetic, never data-sized.
  */
object Procrustes {

  /** Fit the orthogonal alignment from paired rows (xCol → yCol), both
    * `dim`-long double arrays. Returns W as row-major Array[Array] with
    * `x · W ≈ y` for row vectors. Requires MᵀM nonsingular (true whenever
    * the paired data genuinely spans the space). */
  def fitOrthogonal(pairs: DataFrame, xCol: Column, yCol: Column, dim: Int): Array[Array[Double]] = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // M = Σ_rows xᵢ·yⱼ — decimal-exact, partitioning-independent (the Pca
    // Gram-partial recipe, full rectangle instead of upper triangle).
    val cells = graft.tables.Tables
      .rebalanceForCpu( // n·d² BigDecimal loop — parallelize under-partitioned sources
        pairs.select(VectorOps.asDouble(xCol).as("x"), VectorOps.asDouble(yCol).as("y")))
      .as[(Seq[Double], Seq[Double])]
      .mapPartitions { it =>
        val acc = Array.fill[java.math.BigDecimal](dim * dim)(java.math.BigDecimal.ZERO)
        var any = false
        while (it.hasNext) {
          val (x, y) = it.next()
          any = true
          var i = 0
          while (i < dim) {
            val xi = x(i)
            var j  = 0
            while (j < dim) {
              val p = xi * y(j)
              if (!p.isNaN && !p.isInfinite) {
                acc(i * dim + j) = acc(i * dim + j).add(
                  new java.math.BigDecimal(java.lang.Double.toString(p))
                    .setScale(18, java.math.RoundingMode.HALF_UP))
              }
              j += 1
            }
            i += 1
          }
        }
        if (any) Iterator.tabulate(dim * dim)(k => (k, BigDecimal(acc(k)))) else Iterator.empty
      }
      .toDF("k", "p")
      .groupBy(col("k"))
      .agg(sum(col("p").cast("decimal(38,18)")).as("s"))
      .select(col("k"), col("s").cast("double"))
      .as[(Int, Double)]
      .collect() // d² cells — dimension-bounded driver data, like the Pca triangle
    val m = Array.ofDim[Double](dim, dim)
    cells.foreach { case (k, v) => m(k / dim)(k % dim) = v }
    // W = M(MᵀM)^(−1/2) is invariant under M → M/c for any c > 0, and the
    // Jacobi sweep's convergence tolerance is ABSOLUTE — unnormalized
    // cross-covariances (entries grow with row count) stall just above it.
    // Normalize to max|M| = 1; the scale derives only from M itself, so
    // partitioning-invariance is preserved.
    val maxAbs = m.iterator.flatMap(_.iterator).map(math.abs).max
    require(maxAbs > 0.0, "Procrustes: cross-covariance is identically zero")
    var si = 0
    while (si < dim) {
      var sj = 0
      while (sj < dim) { m(si)(sj) /= maxAbs; sj += 1 }
      si += 1
    }

    // MᵀM (symmetric PSD), packed upper triangle for jacobiEigen.
    val mtm = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        var s = 0.0
        var k = 0
        while (k < dim) { s += m(k)(i) * m(k)(j); k += 1 }
        mtm(i)(j) = s; mtm(j)(i) = s
        j += 1
      }
      i += 1
    }
    val upper = Array.ofDim[Double](dim * (dim + 1) / 2)
    i = 0
    var u = 0
    while (i < dim) { var j = i; while (j < dim) { upper(u) = mtm(i)(j); u += 1; j += 1 }; i += 1 }
    val (evals, evecs) = Pca.jacobiEigen(dim, upper) // evecs are ROWS (orthonormal)
    require(
      evals.last > 1e-12 * math.max(evals.head, 1e-300),
      s"Procrustes: MᵀM numerically singular (λmin=${evals.last}, λmax=${evals.head}) — " +
        "paired data does not span the space; alignment is not identifiable")
    // (MᵀM)^(−1/2) = Vᵀ·diag(1/√λ)·V with V's rows the eigenvectors.
    val inv = Array.ofDim[Double](dim, dim)
    i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        var s = 0.0
        var k = 0
        while (k < dim) { s += evecs(k)(i) * evecs(k)(j) / math.sqrt(evals(k)); k += 1 }
        inv(i)(j) = s
        j += 1
      }
      i += 1
    }
    // W = M · (MᵀM)^(−1/2)
    Array.tabulate(dim, dim) { (r, c) =>
      var s = 0.0
      var k = 0
      while (k < dim) { s += m(r)(k) * inv(k)(c); k += 1 }
      s
    }
  }

  /** Apply a fitted W: one broadcast literal matrix, one narrow map —
    * out_j = Σ_i v_i·W_ij. No shuffle. */
  def align(emb: DataFrame, idCol: Column, vecCol: Column, w: Array[Array[Double]]): DataFrame = {
    val dim  = w.length
    val wLit = array(w.map(row => array(row.map(lit): _*)): _*)
    emb
      .select(idCol.cast("long").as("id"), VectorOps.asDouble(vecCol).as("v"))
      .withColumn("__w", wLit)
      .select(
        col("id"),
        transform(
          sequence(lit(0), lit(dim - 1)),
          j =>
            aggregate(
              zip_with(col("v"), transform(col("__w"), row => element_at(row, j + 1)), (x, wij) => x * wij),
              lit(0.0),
              (acc, x) => acc + x)).as("aligned"))
  }
}
