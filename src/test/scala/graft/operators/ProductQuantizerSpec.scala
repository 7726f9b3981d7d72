package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorOps

class ProductQuantizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val p = ProductQuantizer.PqParams()
  private lazy val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")

  test("codes are well-formed: m entries per vector, every code a live codeword") {
    val cb = ProductQuantizer.trainCodebooks(emb, col("vec_id"), col("embedding"), p).localCheckpoint()
    val codes = ProductQuantizer.encode(emb, col("vec_id"), col("embedding"), cb, p)
    assert(codes.count() === emb.count(), "a vector vanished during encoding")
    val bad = codes.filter(size(col("codes")) =!= p.m).count()
    assert(bad === 0L, s"$bad vectors have != ${p.m} codes")
    // Every emitted (sub, code) must exist in the codebook (codes index
    // live codewords, even after empty-cell dropout).
    val live = cb.select(col("sub"), col("code")).as[(Int, Int)].collect().toSet
    val used = codes
      .select(posexplode(col("codes")).as(Seq("sub", "code")))
      .distinct().as[(Int, Int)].collect().toSet
    assert(used.subsetOf(live), s"codes referencing dropped codewords: ${used -- live}")
  }

  test("ADC score ≡ exact dot of the reconstructed vector (lookup-table law)") {
    val cb = ProductQuantizer.trainCodebooks(emb, col("vec_id"), col("embedding"), p).localCheckpoint()
    val codes = ProductQuantizer.encode(emb, col("vec_id"), col("embedding"), cb, p).localCheckpoint()
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val adc = ProductQuantizer
      .adcTopK(codes, cb, q, k = emb.count().toInt, p)
      .as[(Long, Double)].collect().toMap
    val qn = q.select(VectorOps.normalize(VectorOps.asDouble(col("qvec"))).as("qn"))
    val viaDecode = ProductQuantizer
      .decode(codes, cb, p)
      .crossJoin(broadcast(qn))
      .select(col("id"), VectorOps.dot(col("vhat"), col("qn")).as("d"))
      .as[(Long, Double)].collect().toMap
    assert(adc.keySet === viaDecode.keySet)
    adc.foreach { case (id, s) =>
      assert(math.abs(s - viaDecode(id)) < 1e-6, s"ADC diverged from reconstructed dot at $id")
    }
  }

  test("PQ top-10 recalls most of the exact top-10 and is partitioning-independent") {
    val cb = ProductQuantizer.trainCodebooks(emb, col("vec_id"), col("embedding"), p).localCheckpoint()
    val codes = ProductQuantizer.encode(emb, col("vec_id"), col("embedding"), cb, p).localCheckpoint()
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val pq = ProductQuantizer.adcTopK(codes, cb, q, k = 10, p)
      .select("vec_id").as[Long].collect().toSet
    val exact = SimilarityJoin
      .topK(emb, col("vec_id"), col("embedding"),
        emb.filter(col("vec_id") === 0).select(VectorOps.asDouble(col("embedding")).as("qvec")), 10)
      .select("vec_id").as[Long].collect().toSet
    val recall = (pq & exact).size / 10.0
    assert(recall >= 0.4, s"PQ recall@10 $recall below floor; pq=$pq exact=$exact")

    // The serving pattern: ADC shortlist of 50 + exact re-rank recovers
    // the full exact top-10 on this geometry (and can never do better
    // than exact — equality is the ceiling law).
    val reranked = ProductQuantizer
      .adcTopKRerank(emb, col("vec_id"), col("embedding"), codes, cb, q, k = 10, shortlist = 50, p)
      .select("vec_id").as[Long].collect().toSet
    assert(reranked === exact, s"rerank recall@10 ${(reranked & exact).size / 10.0} < 1.0")

    val again = ProductQuantizer
      .adcTopK(codes.repartition(7), cb, q, k = 10, p)
      .select("vec_id").as[Long].collect().toSet
    assert(again === pq, "ADC top-k changed under repartitioning")
  }

  test("ivfPqProbe ≡ inline ADC over the probed lists, and prunes partitions") {
    val centroids = emb.filter(col("vec_id") % 37 === 1).orderBy("vec_id").limit(16)
      .select(col("vec_id").as("cid"), VectorOps.asDouble(col("embedding")).as("cvec"))
    val idx = java.nio.file.Files.createTempDirectory("graft_ivfpq_spec").toString + "/index"
    ProductQuantizer.buildIvfPqIndex(emb, col("vec_id"), col("embedding"), centroids, idx, p)
    val q = emb.filter(col("vec_id") === 0).select(VectorOps.asDouble(col("embedding")).as("qvec"))

    val probe = ProductQuantizer.ivfPqProbe(spark, idx, q, k = 10, nprobe = 4)
    val got   = probe.as[(Long, Double)].collect().toSeq

    // Inline twin: same centroids + codebooks, candidate set = members of
    // the 4 query-nearest centroids, ADC-scored — must match row-for-row.
    val cb = spark.read.parquet(s"$idx/_codebooks")
    val probedCids = centroids
      .crossJoin(broadcast(q))
      .withColumn("csim", VectorOps.cosineNative(spark, col("cvec"), col("qvec")))
      .orderBy(col("csim").desc, col("cid")).limit(4)
      .select(col("cid").cast("long")).as[Long].collect().toSet
    val members = SimilarityJoin
      .ivfAssign(emb, col("vec_id"), col("embedding"), centroids)
      .filter(col("cid").cast("long").isin(probedCids.toSeq: _*))
      .select(col("id"))
    val inline = ProductQuantizer
      .adcTopK(
        ProductQuantizer
          .encode(emb, col("vec_id"), col("embedding"), cb, p)
          .join(members, "id"),
        cb, q, k = 10, p)
      .as[(Long, Double)].collect().toSeq
    assert(got === inline, "materialized probe diverged from the inline ADC twin")

    // The scan must read only the probed cid partitions (codes bytes only).
    val root = probe.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case pl                                                               => pl
    }
    val scan = root
      .collect { case fs: org.apache.spark.sql.execution.FileSourceScanExec => fs }
      .find(_.relation.location.rootPaths.exists(_.toString.contains("index")))
      .getOrElse(fail("no FileSourceScanExec over the index in the probe plan"))
    assert(scan.partitionFilters.nonEmpty, "probe scan has no partition filters — full-index read")
    val selected = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
    assert(selected.length <= 4, s"probe read ${selected.length} partitions, expected <= nprobe=4")
  }

  test("OPQ (PCA-rotated PQ) serving path: k rows, descending, recall floor vs exact") {
    val got = graft.SparkEntry
      .queries("d4_topk_opq")(spark, TestSpark.sf0001)
      .as[(Long, Double)]
      .collect()
    assert(got.length === 10)
    assert(got.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)), "not descending")
    val q = emb.filter(col("vec_id") === 0).select(VectorOps.asDouble(col("embedding")).as("qvec"))
    val exact = SimilarityJoin
      .topK(emb, col("vec_id"), col("embedding"), q, 10)
      .select(col("vec_id")).as[Long].collect().toSet
    val recall = got.map(_._1).count(exact) / 10.0
    // The rotation must not DESTROY the shortlist: same floor as the
    // plain-PQ law (exact parity is not promised — the codebooks differ).
    assert(recall >= 0.5, s"OPQ recall $recall < 0.5")
  }

  test("codebook training is deterministic: two independent trains agree") {
    val a = ProductQuantizer.trainCodebooks(emb, col("vec_id"), col("embedding"), p)
      .as[(Int, Int, Array[Double])].collect().map(r => (r._1, r._2) -> r._3.toSeq).toMap
    val b = ProductQuantizer.trainCodebooks(emb.repartition(5), col("vec_id"), col("embedding"), p)
      .as[(Int, Int, Array[Double])].collect().map(r => (r._1, r._2) -> r._3.toSeq).toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) =>
      v.zip(b(k)).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12, s"codeword $k diverged") }
    }
  }
}
