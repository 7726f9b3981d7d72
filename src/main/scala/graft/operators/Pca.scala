package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** PCA / whitening over an embedding column (SURVEY §2.D D3 extension) —
  * the classic pre-processing pass of embedding pipelines (decorrelate
  * before product quantization, whiten before cosine-LSH, dimensionality-
  * reduce before an ANN index; see Jégou & Chum, "Negative evidences and
  * co-occurrences in image retrieval: the benefit of PCA and whitening",
  * ECCV 2012).
  *
  * Split of labor, and why it scales:
  *  - The DATA-sized work — mean and covariance — is one distributed
  *    aggregation each: covariance explodes every vector into its
  *    d·(d+1)/2 upper-triangle products and hash-aggregates them
  *    map-side-combined, so the shuffle carries ~d² rows total, not
  *    corpus-sized data. Sums run in DECIMAL(38,18), making the fitted
  *    model EXACTLY partitioning-independent (double addition is not
  *    associative; the same convention as the decimal-exact centroid
  *    queries).
  *  - The DIMENSION-sized work — the d×d symmetric eigensolve — runs on
  *    the driver with a deterministic cyclic Jacobi sweep: d ≤ a few
  *    hundred in any embedding pipeline, so this is microseconds of
  *    config-bounded arithmetic (same class as the driver-side nprobe
  *    centroid list), never data-sized.
  *
  * The fitted model IS a DataFrame — (comp, eigenvalue, evec) rows sorted
  * by descending eigenvalue, plus the mean vector under comp = −1 — so
  * shipping/storing/swapping a model is a data operation, consistent with
  * the LM and classifier-gate conventions. */
object Pca {

  /** Deterministic cyclic Jacobi eigensolve of a symmetric matrix given
    * as packed upper triangle. Returns (eigenvalues, eigenvectors) sorted
    * by DESCENDING eigenvalue, eigenvectors as rows; ties and the overall
    * sweep order are fixed, and each eigenvector's sign is normalized
    * (first nonzero component positive) so two fits of the same data are
    * bit-identical. */
  private[operators] def jacobiEigen(dim: Int, upper: Array[Double]): (Array[Double], Array[Array[Double]]) = {
    val a = Array.tabulate(dim, dim) { (i, j) =>
      val (r, c) = if (i <= j) (i, j) else (j, i)
      upper(r * dim - r * (r - 1) / 2 + (c - r))
    }
    val v = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-14) {
      off = 0.0
      for (p <- 0 until dim - 1; q <- p + 1 until dim) {
        off = math.max(off, math.abs(a(p)(q)))
        if (math.abs(a(p)(q)) > 1e-300) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          // Tie-safe Rutishauser form with sign(0) = +1: equal diagonal
          // entries with a nonzero pivot (theta = 0, e.g. duplicated
          // dimensions) must give t = 1 — a 45° rotation annihilating the
          // pivot — not signum(0) = 0 (the identity, which never kills the
          // pivot and silently exhausts the sweep budget).
          val sgn   = if (theta >= 0.0) 1.0 else -1.0
          val denom = theta + sgn * math.sqrt(theta * theta + 1.0)
          // |theta| so large theta² overflows: denom = ±Inf; fall back to
          // the first-order t ≈ 1/(2θ).
          val t = if (denom.isInfinite) 1.0 / (2.0 * theta) else 1.0 / denom
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until dim) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until dim) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until dim) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    // Loud failure over silently-wrong eigenpairs (the connectedComponents
    // convention): 100 cyclic sweeps converge for any d ≤ a few hundred,
    // so non-convergence means a broken input, not a tuning problem.
    if (off > 1e-14)
      throw new IllegalStateException(
        s"jacobiEigen: not converged after 100 sweeps (max off-diagonal = $off)")
    val order = (0 until dim).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val col = Array.tabulate(dim)(k => v(k)(i))
      val firstNz = col.indexWhere(math.abs(_) > 1e-12)
      if (firstNz >= 0 && col(firstNz) < 0) col.map(-_) else col
    }.toArray
    (evals, evecs)
  }

  /** Fit PCA: returns the model frame — comp = −1 row carrying the mean
    * vector (eigenvalue 0), and comp = 0..dim−1 rows carrying descending
    * (eigenvalue, eigenvector). Covariance is the population covariance
    * (divide by n). */
  def fit(emb: DataFrame, idCol: Column, vecCol: Column, dim: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // Gram-partial loop is ~n·d²/2 BigDecimal ops — rebalance an
    // under-partitioned source (single-row-group embeddings file) so the
    // pass parallelizes; no-op on well-split inputs
    val vecs = graft.tables.Tables
      .rebalanceForCpu(emb.select(VectorOps.asDouble(vecCol).as("v")))
    // One pass: n and the decimal-exact component sums → mean. Same
    // per-partition JVM-partial shape as the Gram loop below (no d× row
    // explode through the agg): each element rounds via Double.toString →
    // HALF_UP scale 18 — EXACTLY Spark's double→decimal(38,18) cast the
    // old posexplode plan applied — then BigDecimal partials sum exactly,
    // so the fitted mean stays bit-identical under any partitioning.
    val meanRow = vecs
      .as[Seq[Double]]
      .mapPartitions { it =>
        var acc: Array[java.math.BigDecimal] = null
        var n = 0L
        while (it.hasNext) {
          val v = it.next()
          if (acc == null) acc = Array.fill(v.length)(java.math.BigDecimal.ZERO)
          require(v.length == acc.length,
            s"pca: ragged input — vector of dim ${v.length} after dim ${acc.length}")
          n += 1
          var i = 0
          while (i < v.length) {
            val x = v(i)
            if (!x.isNaN && !x.isInfinite) // non-finite casts to null (dropped) in the SQL twin
              acc(i) = acc(i).add(
                new java.math.BigDecimal(java.lang.Double.toString(x))
                  .setScale(18, java.math.RoundingMode.HALF_UP))
            i += 1
          }
        }
        if (acc == null) Iterator.empty
        else Iterator.tabulate(acc.length)(i => (i, n, BigDecimal(acc(i))))
      }
      .toDF("i", "pn", "ps")
      .groupBy(col("i"))
      .agg(sum(col("pn")).as("n"), sum(col("ps").cast("decimal(38,18)")).as("s"))
      // Sum exactly in decimal, then divide in DOUBLE: decimal division
      // rounds to the result type's capped scale (~1e-7 error), while a
      // double quotient of the exact sum keeps full precision and stays
      // deterministic.
      .select(col("i"), col("n"),
        (col("s").cast("double") / col("n").cast("double")).as("m"))
      .orderBy("i")
      .as[(Int, Long, Double)]
      .collect()
    val n    = meanRow.headOption.map(_._2.toDouble).getOrElse(0.0)
    val mean = meanRow.map(_._3)
    val meanLit = array(mean.map(lit): _*)
    // Second pass: upper-triangle products of the CENTERED vector, packed
    // index k = i·dim − i(i−1)/2 + (j−i) — d(d+1)/2 rows after the
    // map-side-combined hash agg, decimal-exact.
    val centered = vecs.select(zip_with(col("v"), meanLit, (x, m) => x - m).as("c"))
    // Per-partition Gram partials in a JVM loop (the shingleHashesJvm
    // convention: the declarative twin — explode d(d+1)/2 product structs
    // per row — allocates ~n·d²/2 structs and decimal casts and was the
    // suite's slowest query). Semantics are IDENTICAL to
    // sum(p.cast(decimal(38,18))): each double product is rounded
    // HALF_UP at scale 18 (exactly Spark's double→decimal cast), then
    // summed exactly — BigDecimal addition is associative, so the fit
    // stays bit-identical under any partitioning. The shuffle carries
    // partitions·d(d+1)/2 decimal rows into the final exact sum.
    val triLen = dim * (dim + 1) / 2
    val partials = centered
      .as[Seq[Double]]
      .mapPartitions { it =>
        val acc = Array.fill[java.math.BigDecimal](triLen)(java.math.BigDecimal.ZERO)
        var any = false
        while (it.hasNext) {
          val v = it.next()
          any = true
          var i = 0
          var k = 0
          while (i < dim) {
            val vi = v(i)
            var j = i
            while (j < dim) {
              val p = vi * v(j)
              // Non-finite products cast to null (dropped) in the SQL
              // twin; skipping matches that. Rounding replicates Spark's
              // double→decimal cast EXACTLY: scala BigDecimal(Double)
              // parses Double.toString — the shortest decimal form, not
              // the exact binary expansion — then HALF_UP to scale 18
              // (the same convention pinned bit-for-bit by the PageRank
              // differential in DifferentialSpec).
              if (!p.isNaN && !p.isInfinite) {
                acc(k) = acc(k).add(
                  new java.math.BigDecimal(java.lang.Double.toString(p))
                    .setScale(18, java.math.RoundingMode.HALF_UP))
              }
              k += 1
              j += 1
            }
            i += 1
          }
        }
        if (any) Iterator.tabulate(triLen)(k => (k, BigDecimal(acc(k)))) else Iterator.empty
      }
      .toDF("k", "p")
    val tri = partials
      .groupBy(col("k"))
      .agg(sum(col("p").cast("decimal(38,18)")).as("s"))
      .select(col("k"), (col("s").cast("double") / lit(n)).as("cov"))
      .orderBy("k")
      .as[(Int, Double)]
      .collect()
    val upper = Array.ofDim[Double](dim * (dim + 1) / 2)
    tri.foreach { case (k, c) => upper(k) = c }
    val (evals, evecs) = jacobiEigen(dim, upper)
    val rows =
      (-1, 0.0, mean.toSeq) +:
        (0 until dim).map(i => (i, evals(i), evecs(i).toSeq))
    rows.toDF("comp", "eigenvalue", "evec")
  }

  /** Project every vector onto the top-k components: out_j = (v − mean) ·
    * evec_j, optionally whitened (divide by √eigenvalue — the output then
    * has identity covariance on the kept components). One broadcast of
    * the (k+1)-row model, one narrow map — no shuffle. */
  def project(
      emb: DataFrame,
      idCol: Column,
      vecCol: Column,
      model: DataFrame,
      k: Int,
      whiten: Boolean = false
  ): DataFrame = {
    val packed = model
      .select(
        max(when(col("comp") === -1, col("evec"))).as("mean"),
        // array_sort on (comp, …) structs keeps component order.
        transform(
          array_sort(
            collect_list(
              when(col("comp") >= 0 && col("comp") < k,
                struct(col("comp"), col("eigenvalue"), col("evec"))))),
          s => struct(s.getField("eigenvalue").as("ev"), s.getField("evec").as("vec")))
          .as("comps"))
    emb
      .select(idCol.cast("long").as("id"), VectorOps.asDouble(vecCol).as("v"))
      .crossJoin(broadcast(packed))
      .select(
        col("id"),
        transform(
          col("comps"),
          cmp => {
            val dotc = aggregate(
              zip_with(
                zip_with(col("v"), col("mean"), (x, m) => x - m),
                cmp.getField("vec"),
                (c, e) => c * e),
              lit(0.0),
              (acc, x) => acc + x)
            if (whiten) dotc / sqrt(cmp.getField("ev")) else dotc
          })
          .as("proj"))
  }
}
