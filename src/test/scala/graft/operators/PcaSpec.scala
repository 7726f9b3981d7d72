package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorOps

class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 64
  private lazy val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
  private lazy val model =
    Pca.fit(emb, col("vec_id"), col("embedding"), dim).localCheckpoint()

  private def modelRows =
    model.select("comp", "eigenvalue", "evec")
      .as[(Int, Double, Array[Double])].collect().sortBy(_._1)

  test("fit: eigenvalues descend and are non-negative; eigenvectors orthonormal") {
    val comps = modelRows.filter(_._1 >= 0)
    assert(comps.length === dim)
    val evals = comps.map(_._2)
    evals.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-12, s"not descending: $a < $b") }
    assert(evals.last >= -1e-9, s"negative eigenvalue ${evals.last}")
    val vecs = comps.map(_._3)
    for (i <- 0 until dim; j <- i until dim) {
      val d        = vecs(i).zip(vecs(j)).map { case (x, y) => x * y }.sum
      val expected = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expected) < 1e-9, s"evec($i)·evec($j) = $d")
    }
  }

  test("fit solves the eigen equation of the sample covariance (Σv = λv)") {
    // Reference covariance computed directly on the driver from the tiny
    // fixture — the distributed decimal-sum aggregation must agree with it.
    val vs = emb.select(VectorOps.asDouble(col("embedding")).as("v")).as[Array[Double]].collect()
    val n  = vs.length.toDouble
    val mean = Array.tabulate(dim)(i => vs.map(_(i)).sum / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      vs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
    }
    val comps = modelRows.filter(_._1 >= 0)
    comps.take(8).foreach { case (c, lambda, vec) =>
      val sv = Array.tabulate(dim)(i => (0 until dim).map(j => cov(i)(j) * vec(j)).sum)
      sv.zip(vec).foreach { case (s, x) =>
        assert(math.abs(s - lambda * x) < 1e-6, s"comp $c violates Σv=λv: $s vs ${lambda * x}")
      }
    }
    val meanRow = modelRows.find(_._1 == -1).get._3
    meanRow.zip(mean).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("full-dim projection is a rotation: pairwise dots preserved") {
    val proj = Pca.project(emb.limit(20), col("vec_id"), col("embedding"), model, k = dim)
      .as[(Long, Array[Double])].collect().toMap
    val vs = emb.limit(20)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .as[(Long, Array[Double])].collect().toMap
    val mean = modelRows.find(_._1 == -1).get._3
    for (a <- vs.keys.take(5); b <- vs.keys.take(5)) {
      val ca = vs(a).zip(mean).map { case (x, m) => x - m }
      val cb = vs(b).zip(mean).map { case (x, m) => x - m }
      val dOrig = ca.zip(cb).map { case (x, y) => x * y }.sum
      val dProj = proj(a).zip(proj(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dOrig - dProj) < 1e-6, s"rotation broke dot($a,$b): $dOrig vs $dProj")
    }
  }

  test("whitened top-k projection has identity covariance on kept components") {
    val k = 8
    val proj = Pca.project(emb, col("vec_id"), col("embedding"), model, k, whiten = true)
      .as[(Long, Array[Double])].collect().map(_._2)
    val n = proj.length.toDouble
    val pm = Array.tabulate(k)(i => proj.map(_(i)).sum / n)
    for (i <- 0 until k; j <- i until k) {
      val c        = proj.map(p => (p(i) - pm(i)) * (p(j) - pm(j))).sum / n
      val expected = if (i == j) 1.0 else 0.0
      assert(math.abs(c - expected) < 1e-6, s"whitened cov($i,$j) = $c")
    }
  }

  test("jacobiEigen handles equal diagonal entries (theta = 0 tie)") {
    // [[2,1],[1,2]] has a_pp == a_qq, so theta = 0 exactly; the naive
    // signum(theta) rotation is the identity and never annihilates the
    // pivot. True eigenpairs: λ = (3, 1), vectors (1,1)/√2 and (1,−1)/√2
    // — sign-normalized so the first nonzero component is positive.
    val (evals, evecs) = Pca.jacobiEigen(2, Array(2.0, 1.0, 2.0))
    assert(math.abs(evals(0) - 3.0) < 1e-12 && math.abs(evals(1) - 1.0) < 1e-12,
      s"eigenvalues ${evals.toSeq}")
    val r = 1.0 / math.sqrt(2.0)
    assert(evecs(0).zip(Array(r, r)).forall { case (a, b) => math.abs(a - b) < 1e-12 },
      s"evec0 ${evecs(0).toSeq}")
    assert(evecs(1).zip(Array(r, -r)).forall { case (a, b) => math.abs(a - b) < 1e-12 },
      s"evec1 ${evecs(1).toSeq}")
  }

  test("jacobiEigen handles duplicated dimensions (block of ties)") {
    // Covariance of a corpus where dim 1 duplicates dim 0: [[1,1],[1,1]]
    // — theta = 0 AND a rank-deficient matrix. λ = (2, 0).
    val (evals, evecs) = Pca.jacobiEigen(2, Array(1.0, 1.0, 1.0))
    assert(math.abs(evals(0) - 2.0) < 1e-12 && math.abs(evals(1)) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(evecs(0).zip(Array(r, r)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("fit refuses ragged inputs loudly (no silent mean corruption)") {
    // A shorter vector after a longer one would silently under-sum while
    // still counting toward n; a longer one would throw AIOOBE. Both must
    // surface as the explicit ragged-input error instead.
    val ragged = Seq(
      (1L, Array(1.0, 2.0, 3.0)),
      (2L, Array(4.0, 5.0))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Pca.fit(ragged.coalesce(1), col("vec_id"), col("embedding"), 3).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("ragged")), s"unexpected error: ${messages(e)}")
  }

  test("fit is exactly partitioning-independent (decimal sums + deterministic Jacobi)") {
    val again = Pca.fit(emb.repartition(7), col("vec_id"), col("embedding"), dim)
      .select("comp", "eigenvalue", "evec")
      .as[(Int, Double, Array[Double])].collect().sortBy(_._1)
    val base = modelRows
    assert(again.length === base.length)
    again.zip(base).foreach { case ((c1, e1, v1), (c2, e2, v2)) =>
      assert(c1 === c2 && e1 === e2, s"eigenvalue diverged at comp $c1")
      assert(v1.toSeq === v2.toSeq, s"eigenvector diverged at comp $c1")
    }
  }
}
