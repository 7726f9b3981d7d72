package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorOps

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine: self-similarity 1, orthogonal 0, symmetry") {
    val df = Seq(
      (Array(1.0, 0.0, 2.0), Array(1.0, 0.0, 2.0)),
      (Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0)),
      (Array(1.0, 2.0, 3.0), Array(-3.0, 0.5, 4.0))
    ).toDF("a", "b")
    val out = df.select(
      VectorOps.cosine(col("a"), col("b")).as("ab"),
      VectorOps.cosine(col("b"), col("a")).as("ba")
    ).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(out(1).getDouble(0)) < 1e-12)
    assert(out(2).getDouble(0) === out(2).getDouble(1)) // symmetry, bit-exact
  }

  test("brute-force topK returns the query itself first, k rows, descending") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q   = emb.filter(col("vec_id") === 7).select(VectorOps.asDouble(col("embedding")).as("qvec"))
    val top = SimilarityJoin.topK(emb, col("vec_id"), col("embedding"), q, 5)
      .as[(Long, Double)].collect()
    assert(top.length === 5)
    assert(top.head._1 === 7L && math.abs(top.head._2 - 1.0) < 1e-6)
    assert(top.map(_._2).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("marginMining: planted aligned pair wins with a high margin; a hub vector " +
      "close to everything is normalized away; mutual-kNN and threshold laws hold") {
    // 6 source + 6 target vectors in 4-D. s0/t0 are a planted aligned
    // pair (near-identical direction). t5 is a HUB: moderately close to
    // EVERY source (the centroid direction), so its raw cosines are high
    // but its margin ≈ 1 — the ratio criterion's whole point.
    def v(xs: Double*): Array[Double] = xs.toArray
    val src = Seq(
      (0L, v(10, 0, 0, 1)), (1L, v(0, 10, 0, 1)), (2L, v(0, 0, 10, 1)),
      (3L, v(7, 7, 0, 1)), (4L, v(0, 7, 7, 1)), (5L, v(7, 0, 7, 1))
    ).toDF("sid", "svec")
    val tgt = Seq(
      (100L, v(9.9, 0.1, 0, 1)),            // ≈ s0: the planted pair
      (101L, v(0.2, 9.8, 0.3, 1)),          // ≈ s1
      (102L, v(0.1, 0.2, 9.9, 1)),          // ≈ s2
      (103L, v(5, -5, 3, 1)), (104L, v(-5, 3, 5, 1)),
      (105L, v(4, 4, 4, 1))                  // the hub: close to everyone
    ).toDF("tid", "tvec")
    val mined = SimilarityJoin.marginMining(src, tgt, k = 3, tau = 1.05)
      .orderBy("sid", "tid")
      .select("sid", "tid", "cos", "margin")
      .as[(Long, Long, Double, Double)].collect()
    val pairs = mined.map(r => (r._1, r._2)).toSet
    assert(pairs.contains((0L, 100L)), s"planted pair missing: ${mined.mkString(", ")}")
    assert(pairs.contains((1L, 101L)) && pairs.contains((2L, 102L)))
    // the hub never clears the margin bar despite high raw cosines
    assert(!pairs.exists(_._2 == 105L),
      s"hub vector survived the margin filter: ${mined.mkString(", ")}")
    // every emitted margin clears tau; planted pairs carry the largest
    assert(mined.forall(_._4 > 1.05))
    val planted = mined.filter(r => Set((0L,100L),(1L,101L),(2L,102L)).contains((r._1,r._2)))
    assert(planted.map(_._4).min > mined.filterNot(r =>
      Set((0L,100L),(1L,101L),(2L,102L)).contains((r._1,r._2)))
      .map(_._4).maxOption.getOrElse(0.0))
    // mutual-kNN: an emitted pair is in BOTH top-k lists by construction —
    // re-derive the forward list for s0 and check 100 is in it
    val s0 = src.filter(col("sid") === 0L)
    val fwd = SimilarityJoin.topKBatch(
      tgt.select(col("tid").as("vec_id"), col("tvec").as("embedding")),
      col("vec_id"), col("embedding"),
      s0.select(col("sid").as("qid"), col("svec").as("qvec")), k = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(fwd.contains(100L))
    // a side SMALLER than k must not inflate margins: with 1 source and
    // 1 target the neighbor average IS the pair's own cosine on both
    // sides, so the margin is exactly 1 — never above any tau ≥ 1
    // (the fixed-2k denominator bug would have scored it k)
    val tiny = SimilarityJoin.marginMining(
      src.filter(col("sid") === 0L), tgt.filter(col("tid") === 100L), k = 4, tau = 1.0)
    assert(tiny.count() === 0L, "margin over a single pair must be exactly 1, not > 1")
    val tinyAll = SimilarityJoin.marginMining(
      src.filter(col("sid") === 0L), tgt.filter(col("tid") === 100L), k = 4, tau = 0.5)
      .select("margin").as[Double].collect()
    assert(tinyAll.toSeq === Seq(1.0))
  }

  test("IVF topK achieves recall vs brute force; full probe = exact") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q   = emb.filter(col("vec_id") === 0).select(VectorOps.asDouble(col("embedding")).as("qvec"))
    val centroids = emb.filter(col("vec_id") % 37 === 1).orderBy("vec_id").limit(16)
      .select(col("vec_id").as("cid"), VectorOps.asDouble(col("embedding")).as("cvec"))
    val exact = SimilarityJoin.topK(emb, col("vec_id"), col("embedding"), q, 10)
      .select("vec_id").as[Long].collect().toSet
    val ivfAll = SimilarityJoin.ivfTopK(emb, col("vec_id"), col("embedding"), centroids, q, 10, nprobe = 16)
      .select("vec_id").as[Long].collect().toSet
    assert(ivfAll === exact, "probing every list must equal brute force")
    val ivf4 = SimilarityJoin.ivfTopK(emb, col("vec_id"), col("embedding"), centroids, q, 10, nprobe = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(ivf4.intersect(exact).size >= 2, s"nprobe=4 recall collapsed: $ivf4 vs $exact")
  }

  test("Lloyd-refined centroids: aggregate IVF recall does not regress vs raw seeds") {
    // Per-query recall at nprobe=4 is noisy either way (±2 of 10); the law
    // is aggregate: over a fixed query panel, refined centroids recall at
    // least as many true top-10 neighbors as the raw modulo seeds, and
    // clear an absolute floor (measured raw=47, refined=49 of 80).
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val seeds = emb.filter(col("vec_id") % 37 === 1).orderBy("vec_id").limit(16)
      .select(col("vec_id").as("cid"), VectorOps.asDouble(col("embedding")).as("cvec"))
    val refined =
      SimilarityJoin.lloydRefine(emb, col("vec_id"), col("embedding"), seeds, iters = 2).cache()
    val panel = Seq(0L, 5L, 11L, 23L, 42L, 77L, 100L, 150L)
    def recall(cs: org.apache.spark.sql.DataFrame): Int =
      panel.map { qid =>
        val q = emb.filter(col("vec_id") === qid)
          .select(VectorOps.asDouble(col("embedding")).as("qvec"))
        val exact = SimilarityJoin.topK(emb, col("vec_id"), col("embedding"), q, 10)
          .select("vec_id").as[Long].collect().toSet
        SimilarityJoin.ivfTopK(emb, col("vec_id"), col("embedding"), cs, q, 10, nprobe = 4)
          .select("vec_id").as[Long].collect().toSet.intersect(exact).size
      }.sum
    val (rawR, refinedR) = (recall(seeds), recall(refined))
    assert(refinedR >= rawR, s"refinement regressed aggregate recall: $refinedR < $rawR")
    assert(refinedR >= 45, s"refined aggregate recall floor broken: $refinedR/80")
  }

  test("ivfProbe over a materialized index matches ivfTopK and prunes partitions") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q   = emb.filter(col("vec_id") === 0).select(VectorOps.asDouble(col("embedding")).as("qvec"))
    val centroids = emb.filter(col("vec_id") % 37 === 1).orderBy("vec_id").limit(16)
      .select(col("vec_id").as("cid"), VectorOps.asDouble(col("embedding")).as("cvec"))
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_spec").toString + "/index"
    SimilarityJoin.buildIvfIndex(emb, col("vec_id"), col("embedding"), centroids, idx)

    val probe = SimilarityJoin.ivfProbe(spark, idx, q, k = 10, nprobe = 4)
    // Same centroids, same nprobe → identical result to the self-contained form.
    val inline = SimilarityJoin.ivfTopK(emb, col("vec_id"), col("embedding"), centroids, q, 10, nprobe = 4)
      .as[(Long, Double)].collect().toSeq
    assert(probe.as[(Long, Double)].collect().toSeq === inline)

    // The probe must scan only the nprobe probed cid partitions — the whole
    // point of materializing the assignment (VERDICT r3 #3).
    val root = probe.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p                                                                => p
    }
    val scan = root
      .collect { case fs: org.apache.spark.sql.execution.FileSourceScanExec => fs }
      .find(_.relation.location.rootPaths.exists(_.toString.contains("index")))
      .getOrElse(fail("no FileSourceScanExec over the index in the probe plan"))
    assert(scan.partitionFilters.nonEmpty, "probe scan has no partition filters — full-index read")
    val selected = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
    assert(selected.length <= 4, s"probe read ${selected.length} partitions, expected <= nprobe=4")
  }

  test("filtered ivfProbe: results respect the filter and equal exact ranking over probed rows") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q   = emb.filter(col("vec_id") === 0).select(VectorOps.asDouble(col("embedding")).as("qvec"))
    val centroids = emb.filter(col("vec_id") % 37 === 1).orderBy("vec_id").limit(16)
      .select(col("vec_id").as("cid"), VectorOps.asDouble(col("embedding")).as("cvec"))
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_filt").toString + "/index"
    SimilarityJoin.buildIvfIndex(emb, col("vec_id"), col("embedding"), centroids, idx)

    val keep = emb.filter(col("label") === 3).select(col("vec_id"))
    val keepSet = keep.as[Long].collect().toSet
    val got = SimilarityJoin.ivfProbe(spark, idx, q, k = 10, nprobe = 8, keep = Some(keep))
      .as[(Long, Double)].collect().toSeq
    // Every hit passes the metadata predicate.
    assert(got.map(_._1).forall(keepSet), s"filter leaked: $got")
    // ≡ the unfiltered probe of the SAME partitions, post-filtered: the
    // semi-join must not perturb scores or order (over-fetched unfiltered
    // k must cover ≥ 10 kept rows for this identity — 500 does).
    val unfiltered = SimilarityJoin.ivfProbe(spark, idx, q, k = 500, nprobe = 8)
      .as[(Long, Double)].collect().toSeq
    assert(got === unfiltered.filter(r => keepSet(r._1)).take(10))
    // Recall floor vs the exact filtered ranking (brute force over the
    // whole corpus, filter first): same regime as the unfiltered probes.
    val exact = SimilarityJoin
      .topK(emb.join(keep, Seq("vec_id"), "left_semi"), col("vec_id"), col("embedding"), q, 10)
      .select(col("vec_id")).as[Long].collect().toSet
    val recall = got.map(_._1).count(exact) / 10.0
    assert(recall >= 0.5, s"filtered probe recall $recall < 0.5")
  }

  test("ivfDriftStats: in-distribution shard scores high, out-of-distribution shard drifts") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val centroids = emb.filter(col("vec_id") % 37 === 1).orderBy("vec_id").limit(16)
      .select(col("vec_id").as("cid"), VectorOps.asDouble(col("embedding")).as("cvec"))
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_drift").toString + "/index"
    SimilarityJoin.buildIvfIndex(emb, col("vec_id"), col("embedding"), centroids, idx)

    def weightedMean(df: org.apache.spark.sql.DataFrame): Double = {
      val rows = df.select("n_new", "mean_sim").as[(Long, Double)].collect()
      rows.map { case (n, m) => n * m }.sum / rows.map(_._1).sum
    }
    // A shard that IS the centroid set: every vector must land on its own
    // centroid at similarity exactly 1 — pins argmax assignment AND the
    // scoring in one law.
    val asShard = centroids.select(col("cid").as("vec_id"), col("cvec").as("embedding"))
    val tight   = SimilarityJoin.ivfDriftStats(asShard, col("vec_id"), col("embedding"), idx)
    assert(tight.select("mean_sim").as[Double].collect().forall(_ === 1.0),
      "centroid vectors must score 1.0 at their own centroid")
    // The same shard NEGATED: maximally drifted — no centroid describes
    // it, and the monitor's mean similarity collapses.
    val drifted = weightedMean(SimilarityJoin.ivfDriftStats(
      asShard.select(col("vec_id"), transform(col("embedding"), x => -x).as("embedding")),
      col("vec_id"), col("embedding"), idx))
    assert(drifted < 0.5, s"negated centroids should drift far below 1.0: $drifted")
    // and on a REAL shard: per-centroid counts conserve the shard size.
    val realShard = emb.filter(col("vec_id") % 4 === 3)
    val total = SimilarityJoin.ivfDriftStats(realShard, col("vec_id"), col("embedding"), idx)
      .agg(sum("n_new")).as[Long].collect().head
    assert(total === realShard.count())
  }

  test("ivfDriftStats vs the stored _stats baseline: ≈0 in-distribution, >0 on a shifted shard") {
    // The raw fixture is near-isotropic (best-of-16 centroid cosine ≈ 0.23
    // for ANY direction), so no transformation of ITS vectors separates
    // from its own baseline. The baseline law needs an index whose
    // centroids genuinely describe their members, so the fixture here is a
    // PLANTED tight corpus: members = centroid + 0.15·roll(centroid, k)
    // (cos ≈ 0.99, deterministic — no RNG). Same-construction shards stay
    // at drift ≈ 0; the raw fixture vectors ARE the distribution shift
    // (measured: 6e-5 vs 0.755).
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val centroids = emb.filter(col("vec_id") % 37 === 1).orderBy("vec_id").limit(16)
      .select(col("vec_id").as("cid"), VectorOps.asDouble(col("embedding")).as("cvec"))
    def planted(ks: Seq[Int]) = ks
      .map(k => centroids.select(
        (col("cid") * 100 + k).as("vec_id"),
        zip_with(
          col("cvec"),
          // roll(cvec, k): element i of the rolled vector is cvec[(i - k) mod 64]
          transform(sequence(lit(0), lit(63)), i => element_at(col("cvec"), pmod(i - k, lit(64)) + 1)),
          (x, r) => x + lit(0.15) * r).as("embedding")))
      .reduce(_ unionByName _)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_baseline").toString + "/index"
    SimilarityJoin.buildIvfIndex(planted(1 to 20), col("vec_id"), col("embedding"), centroids, idx)

    // The build persisted the per-cid baseline inside the index directory.
    val stats = spark.read.parquet(s"$idx/_stats")
      .select("cid", "n_built", "build_mean_sim").as[(Long, Long, Double)].collect()
    // 14 seeds exist at sf0.001 (ids ≡ 1 mod 37 among 500), 20 copies each.
    assert(stats.map(_._2).sum === centroids.count() * 20, "_stats must cover the built index")
    assert(stats.forall(s => s._3 >= -1.0 && s._3 <= 1.0))

    def weightedDrift(df: org.apache.spark.sql.DataFrame): Double = {
      val rows = df.filter(col("drift").isNotNull) // cids the build saw no members for
        .select("n_new", "drift").as[(Long, Double)].collect()
      rows.map { case (n, d) => n * d }.sum / rows.map(_._1).sum
    }
    // A shard DRAWN FROM the indexed distribution (same construction,
    // fresh roll offsets): per-cid mean_sim tracks the build-time mean.
    val inDrift = weightedDrift(SimilarityJoin.ivfDriftStats(
      planted(21 to 25), col("vec_id"), col("embedding"), idx))
    assert(math.abs(inDrift) < 0.05, s"in-distribution shard should not drift: $inDrift")
    // The PLANTED SHIFT: raw fixture vectors, which no tight centroid
    // describes — mean_sim collapses below the stored baseline and drift
    // goes strongly positive. This is the re-run-Lloyd alarm.
    val outDrift = weightedDrift(SimilarityJoin.ivfDriftStats(
      emb.filter(col("vec_id") % 4 === 3), col("vec_id"), col("embedding"), idx))
    assert(outDrift > 0.3, s"shifted shard must drift positive: $outDrift")
    assert(outDrift > inDrift + 0.25, "monitor cannot separate shifted from in-distribution")
  }

  test("quantized IVF index: smaller on disk, probe recall tracks the full-precision probe") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q   = emb.filter(col("vec_id") === 0).select(VectorOps.asDouble(col("embedding")).as("qvec"))
    val centroids = emb.filter(col("vec_id") % 37 === 1).orderBy("vec_id").limit(16)
      .select(col("vec_id").as("cid"), VectorOps.asDouble(col("embedding")).as("cvec"))
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_q").toString
    SimilarityJoin.buildIvfIndex(emb, col("vec_id"), col("embedding"), centroids, s"$base/full")
    SimilarityJoin.buildIvfIndexQuantized(emb, col("vec_id"), col("embedding"), centroids, s"$base/q")

    def dataBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().filterNot(_.getName.startsWith("_")).map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length() else 0L
      walk(new java.io.File(p))
    }
    val (fullB, qB) = (dataBytes(s"$base/full"), dataBytes(s"$base/q"))
    assert(qB < fullB * 6 / 10, s"quantized index not smaller: $qB vs $fullB")

    val full = SimilarityJoin.ivfProbe(spark, s"$base/full", q, 10, nprobe = 4)
      .select("vec_id").as[Long].collect().toSet
    val quant = SimilarityJoin.ivfProbe(spark, s"$base/q", q, 10, nprobe = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(quant.intersect(full).size >= 7, s"quantized probe diverged: $quant vs $full")
  }

  test("registered IVF queries probe path-keyed indexes (float + quantized)") {
    val sf   = TestSpark.sf0001
    val full = graft.queries.LlmQueries.defs("d4_topk_ivf")(spark, sf)
      .select("vec_id").as[Long].collect()
    val quant = graft.queries.LlmQueries.defs("d4_topk_ivf_q")(spark, sf)
      .select("vec_id").as[Long].collect()
    assert(full.length === 10 && quant.length === 10)
    assert(quant.toSet.intersect(full.toSet).size >= 7,
      s"quantized probe diverged from float probe: ${quant.toSeq} vs ${full.toSeq}")
    // Index directories key on the SANITIZED DATASET PATH (collision-free by
    // construction), not abs(hashCode) — VERDICT r4 §wrong-3.
    val tmp = System.getProperty("java.io.tmpdir")
    val key = sf.replaceAll("[^A-Za-z0-9._-]", "_")
    assert(new java.io.File(s"$tmp/graft_ivf_$key").isDirectory, "float index dir not path-keyed")
    assert(new java.io.File(s"$tmp/graft_ivf_${key}_q").isDirectory, "quantized index dir not path-keyed")
  }

  test("selfJoinThreshold refuses a constant block column on a large input (all-pairs guard)") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    // Lowered byte threshold stands in for a 100 TB table: the unblocked
    // (constant-block) form must refuse at plan time, with no job run.
    val e = intercept[IllegalArgumentException] {
      SimilarityJoin.selfJoinThreshold(
        emb, col("vec_id"), col("embedding"), lit(0), threshold = 0.3,
        maxUnblockedBytes = 1024)
    }
    assert(e.getMessage.contains("ALL-PAIRS"), e.getMessage)
    // A REAL block column sails through the same threshold (the guard is
    // about degenerate blocking, not input size)...
    assert(SimilarityJoin.selfJoinThreshold(
      emb, col("vec_id"), col("embedding"), col("label"), threshold = 0.3,
      maxUnblockedBytes = 1024).count() >= 0)
    // ...and a deliberate unblocked run is still available by opting out.
    assert(SimilarityJoin.selfJoinThreshold(
      emb.limit(50), col("vec_id"), col("embedding"), lit(0), threshold = 0.3,
      maxUnblockedBytes = 0).count() >= 0)
  }

  test("selfJoinThreshold emits each qualifying pair once with a < b") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .filter(col("vec_id") < 100)
    val pairs = SimilarityJoin
      .selfJoinThreshold(emb, col("vec_id"), col("embedding"), lit(0), threshold = 0.1)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(p => p._1 < p._2))
    assert(pairs.map(p => (p._1, p._2)).distinct.length === pairs.length)
    assert(pairs.forall(_._3 >= 0.1 - 1e-9))
  }

  test("incremental IVF add: probe(add(build(A), B)) ≡ probe(build(A ∪ B)) on identical centroids") {
    val emb  = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val ids  = emb.select("vec_id").as[Long].collect().sorted
    val mid  = ids(ids.length / 2)
    val a    = emb.filter(col("vec_id") < mid)
    val b    = emb.filter(col("vec_id") >= mid)
    val centroids = SimilarityJoin.lloydRefine(
      a, col("vec_id"), col("embedding"),
      a.filter(col("vec_id") % 37 === 1).orderBy("vec_id").limit(8)
        .select(col("vec_id").as("cid"), VectorOps.asDouble(col("embedding")).as("cvec")),
      iters = 1)
    val q = emb.filter(col("vec_id") === 0).select(VectorOps.asDouble(col("embedding")).as("qvec"))
    val base = java.nio.file.Files.createTempDirectory("ivf_incr").toString

    for ((build, tag) <- Seq(
        (SimilarityJoin.buildIvfIndex _, "float"),
        (SimilarityJoin.buildIvfIndexQuantized _, "int8"))) {
      val incrPath = s"$base/incr_$tag"
      val fullPath = s"$base/full_$tag"
      build(a, col("vec_id"), col("embedding"), centroids, incrPath)
      SimilarityJoin.addToIvfIndex(b, col("vec_id"), col("embedding"), incrPath)
      build(emb, col("vec_id"), col("embedding"), centroids, fullPath)
      for (nprobe <- Seq(3, 8)) {
        val incr = SimilarityJoin.ivfProbe(spark, incrPath, q, k = 10, nprobe)
          .as[(Long, Double)].collect().toSeq
        val full = SimilarityJoin.ivfProbe(spark, fullPath, q, k = 10, nprobe)
          .as[(Long, Double)].collect().toSeq
        assert(incr === full, s"layout=$tag nprobe=$nprobe")
      }
      // The add reused the existing layout (quantized index stays quantized).
      val cols = spark.read.parquet(incrPath).columns.toSet
      assert(cols.contains("q") === (tag == "int8"), s"layout drifted for $tag")
      // The skew audit sees every row of build + add, grouped by cid.
      val stats = SimilarityJoin.ivfIndexStats(spark, incrPath)
        .as[(Long, Long)].collect()
      assert(stats.map(_._2).sum === ids.length.toLong, s"stats missed rows for $tag")
      assert(stats.map(_._1).distinct.length === stats.length)
    }
  }

  test("semanticDedup keeps exactly the minimum id of every cosine cluster (union-find differential)") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .filter(col("vec_id") < 200)
    val threshold = 0.3
    val pairs = SimilarityJoin
      .selfJoinThreshold(emb, col("vec_id"), col("embedding"), col("label"), threshold)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture produced no cosine-near pairs; threshold miscalibrated")
    // Driver-side union-find over the collected pairs = ground truth.
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    pairs.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val losers = parent.keys.filter(x => find(x) != x).toSet
    val allIds = emb.select("vec_id").as[Long].collect().toSet

    val survivors = SimilarityJoin
      .semanticDedup(emb, col("vec_id"), col("embedding"), col("label"), threshold)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors === (allIds -- losers))
    // Schema passes through unchanged.
    assert(SimilarityJoin
      .semanticDedup(emb, col("vec_id"), col("embedding"), col("label"), threshold)
      .columns.toSeq === emb.columns.toSeq)
  }

  test("topKBatch: per-query top-k matches single-query topK") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val queries = emb.filter(col("vec_id").isin(3, 11))
      .select(col("vec_id").as("qid"), VectorOps.asDouble(col("embedding")).as("qvec"))
    val batch = SimilarityJoin.topKBatch(emb, col("vec_id"), col("embedding"), queries, 5)
      .select("qid", "vec_id", "cos").as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (-r._3, r._2)).map(_._2).toSeq).toMap
    for (q <- Seq(3L, 11L)) {
      val single = SimilarityJoin.topK(
        emb, col("vec_id"), col("embedding"),
        emb.filter(col("vec_id") === q).select(VectorOps.asDouble(col("embedding")).as("qvec")), 5)
        .select("vec_id").as[Long].collect().toSeq
      assert(batch(q) === single, s"qid=$q")
    }
  }

  test("vector ops: euclidean/normalize identities") {
    val df = Seq((Array(3.0, 4.0), Array(0.0, 0.0))).toDF("a", "b")
    val r = df.select(
      VectorOps.euclidean(col("a"), col("b")).as("d"),
      VectorOps.normalize(col("a")).as("n")
    ).collect().head
    assert(r.getDouble(0) === 5.0)
    assert(r.getSeq[Double](1) === Seq(0.6, 0.8))
  }

  test("LSH self-join: subset of exact pairs, nonempty recall at low nbits") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .filter(col("vec_id") < 200)
    val exact = SimilarityJoin
      .selfJoinThreshold(emb, col("vec_id"), col("embedding"), lit(0), threshold = 0.12)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val viaLsh = SimilarityJoin
      .lshSelfJoinThreshold(emb, col("vec_id"), col("embedding"), dim = 64, threshold = 0.12, nbits = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(viaLsh.subsetOf(exact), "LSH emitted a pair the exact join rejects")
    assert(viaLsh.nonEmpty, "nbits=2 should recall some pairs")
  }

  test("LSH semantic clusters refine exact clusters: containment, survivor superset, recall floor") {
    // The d9_semantic_clusters_lsh composition: LSH pairs ⊆ exact pairs
    // (exact-cosine verification), so connected components over the LSH
    // graph REFINE the exact components — every LSH cluster lives inside
    // one exact cluster, and every LSH loser (node ≠ cluster min) is an
    // exact loser too. Recall of the pair generator is the probabilistic
    // part; floor measured on the fixture at nbits=2.
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val threshold = 0.3
    def clustersOf(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Dedup.connectedComponents(pairs)
        .select("node", "cluster").as[(Long, Long)].collect().toMap
    val exactPairs = SimilarityJoin
      .selfJoinThreshold(emb, col("vec_id"), col("embedding"), lit(0), threshold)
      .select("id_a", "id_b")
    val lshPairs = SimilarityJoin
      .lshSelfJoinThreshold(
        emb, col("vec_id"), col("embedding"), dim = 64, threshold, nbits = 2, tables = 4)
      .select("id_a", "id_b")
    val (exactSet, lshSet) = (
      exactPairs.as[(Long, Long)].collect().toSet,
      lshPairs.as[(Long, Long)].collect().toSet)
    assert(exactSet.nonEmpty, "fixture produced no exact pairs at 0.3 — law vacuous")
    assert(lshSet.subsetOf(exactSet), "LSH emitted a pair the exact join rejects")
    // Pair recall floor at the registered query's 4×2-bit params
    // (theory 1-(1-0.597²)⁴ ≈ 0.83 for cos-0.3 pairs; floor leaves room
    // for fixture regeneration, not collapse).
    assert(lshSet.size >= exactSet.size / 2, s"LSH pair recall collapsed: ${lshSet.size}/${exactSet.size}")
    // The OR-construction genuinely lifts recall over one table.
    val oneTable = SimilarityJoin
      .lshSelfJoinThreshold(emb, col("vec_id"), col("embedding"), dim = 64, threshold, nbits = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(oneTable.subsetOf(exactSet))
    assert(lshSet.size > oneTable.size, "4 tables recalled no more pairs than 1")

    val exactC = clustersOf(exactPairs)
    val lshC   = clustersOf(lshPairs)
    // Containment: all members of an LSH cluster share one exact cluster.
    lshC.groupBy(_._2).foreach { case (c, members) =>
      val exactIds = members.keys.map(exactC).toSet
      assert(exactIds.size === 1, s"LSH cluster $c spans exact clusters $exactIds")
    }
    // Survivor policy transfers: every LSH loser is an exact loser, so the
    // LSH pass never deletes a doc the exact pass would keep.
    val lshLosers   = lshC.collect { case (n, c) if n != c => n }.toSet
    val exactLosers = exactC.collect { case (n, c) if n != c => n }.toSet
    assert(lshLosers.subsetOf(exactLosers))
  }

  test("k-means-blocked semantic clusters refine exact clusters (SemDeDup paper path)") {
    // d9_semantic_clusters_kmeans' composition: nearest-centroid blocks →
    // within-block exact-cosine pairs → CC. Blocked pairs are a subset of
    // the unblocked exact pairs (cosine is verified), so the same
    // refinement/survivor-transfer laws as the LSH path hold; recall is
    // whatever fraction of near pairs shares a centroid.
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val centroids = emb.filter(col("vec_id") % 37 === 1).orderBy("vec_id").limit(16)
      .select(col("vec_id").as("cid"), VectorOps.asDouble(col("embedding")).as("cvec"))
    val assigned = SimilarityJoin.ivfAssign(emb, col("vec_id"), col("embedding"), centroids)
    val blocked = SimilarityJoin
      .selfJoinThreshold(assigned, col("id"), col("v"), col("cid"), threshold = 0.3)
      .select("id_a", "id_b")
    val exact = SimilarityJoin
      .selfJoinThreshold(emb, col("vec_id"), col("embedding"), lit(0), threshold = 0.3)
      .select("id_a", "id_b")
    val (blockedSet, exactSet) = (
      blocked.as[(Long, Long)].collect().toSet,
      exact.as[(Long, Long)].collect().toSet)
    assert(blockedSet.nonEmpty, "no within-block pairs — blocking degenerate")
    assert(blockedSet.subsetOf(exactSet), "blocked join emitted a pair the exact join rejects")
    def clustersOf(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Dedup.connectedComponents(pairs)
        .select("node", "cluster").as[(Long, Long)].collect().toMap
    val exactC = clustersOf(exact)
    clustersOf(blocked).groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.map(exactC).toSet.size === 1, s"blocked cluster $c spans exact clusters")
    }
  }

  test("lshSelfJoinThreshold bucket cap: no-op above all buckets, refuses the quadratic regime") {
    // The near-isotropic fixture at 2 bits puts ~n/4 rows in EVERY bucket
    // — precisely the geometry where uncapped LSH degenerates into an
    // all-pairs join. The cap's contract: a cap above every bucket
    // changes nothing; a production-sized cap under the degenerate bucket
    // sizes contributes zero candidates (bounded work, loudly-empty
    // result) instead of paying Σ bucket².
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    def pairs(cap: Int): Set[(Long, Long)] = SimilarityJoin
      .lshSelfJoinThreshold(
        emb, col("vec_id"), col("embedding"), dim = 64, threshold = 0.3,
        nbits = 2, tables = 4, maxBucketSize = cap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val uncapped = pairs(0)
    assert(uncapped.nonEmpty)
    assert(pairs(100000) === uncapped, "a cap above every bucket must be a no-op")
    // 500 vectors / 4 buckets ≈ 125 per bucket: a cap of 64 (the text-LSH
    // default) drops every degenerate bucket.
    assert(pairs(64) === Set.empty, "capped run paid the quadratic bucket anyway")
  }

  test("int8 quantization: bounded error, cosine preserved, top-k recall holds") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("sc", VectorOps.maxAbsScale(col("v")))
      .withColumn("q", VectorOps.quantizeI8(col("v"), col("sc")))
      .withColumn("vq", VectorOps.dequantizeI8(col("q"), col("sc")))

    // codes are genuinely int8 and per-component error <= scale/2
    val bad = emb.select(
      aggregate(zip_with(col("v"), col("vq"), (x, y) => abs(x - y)), lit(0.0),
        (acc, e) => greatest(acc, e)).as("maxerr"), col("sc"))
      .filter(col("maxerr") > col("sc") * 0.5 + 1e-12).count()
    assert(bad === 0L, "component error exceeded scale/2")

    // cosine distortion is small on real vectors
    val maxCosErr = emb
      .select(abs(
        VectorOps.cosineNative(spark, col("v"), col("v")) -
          VectorOps.cosineNative(spark, col("v"), col("vq"))).as("e"))
      .agg(max(col("e"))).as[Double].collect().head
    assert(maxCosErr < 0.02, s"cosine distortion $maxCosErr")

    // search over dequantized vectors keeps top-10 recall >= 8/10
    val q = emb.filter(col("vec_id") === 7).select(col("v").as("qvec"))
    val exact = SimilarityJoin.topK(emb, col("vec_id"), col("v"), q, 10)
      .select("vec_id").as[Long].collect().toSet
    val viaQ = SimilarityJoin.topK(
      emb.select(col("vec_id"), col("vq")), col("vec_id"), col("vq"), q, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(viaQ.intersect(exact).size >= 8, s"quantized recall ${viaQ.intersect(exact).size}/10")
  }

  test("native LSH bucket expression is bit-identical to the declarative sign-matrix form") {
    // The pre-round-6 Column form: dim×nbits literal sign matrix. Kept here
    // as the golden reference — the native expression must produce the SAME
    // buckets (so recall laws and any persisted bucket keys carry over).
    def oldBucket(vec: org.apache.spark.sql.Column, dim: Int, nbits: Int) =
      (0 until nbits).foldLeft(lit(0L)) { (acc, b) =>
        val dotSign = aggregate(
          zip_with(
            vec,
            array((0 until dim).map(i =>
              when(xxhash64(lit(b * 131071 + i)) % 2 === 0, 1.0).otherwise(-1.0)): _*),
            (x, s) => x * s),
          lit(0.0),
          (s, v) => s + v)
        shiftleft(acc, 1).bitwiseOR(when(dotSign >= 0, lit(1L)).otherwise(lit(0L)))
      }
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    val mismatches = emb
      .withColumn("nb", SimilarityJoin.cosineLshBucket(col("v"), dim = 64, nbits = 8))
      .withColumn("ob", oldBucket(col("v"), dim = 64, nbits = 8))
      .filter(col("nb") =!= col("ob"))
      .count()
    assert(mismatches === 0L, "native LSH bucket diverged from the declarative form")

    // Degenerate inputs keep the old semantics: null vector / wrong length /
    // null element all landed in bucket 0 (never NULL) under the old form.
    val weird = Seq(
      (1L, Some(Seq(1.0, 2.0, 3.0))), // length 3 != dim 64
      (2L, None)                      // null vector
    ).toDF("id", "v").select(col("id"), col("v").cast("array<double>").as("v"))
    val weirdOut = weird
      .withColumn("b", SimilarityJoin.cosineLshBucket(col("v"), dim = 64, nbits = 8))
      .select("b").as[Long].collect()
    assert(weirdOut.forall(_ === 0L), s"degenerate inputs must land in bucket 0: ${weirdOut.toSeq}")
  }

  test("LSH bucket at production dims (1024) stays fast and deterministic") {
    // The old literal-matrix form at dim=1024, nbits=8 is an ~8k-literal
    // expression tree that breaks codegen; the native expression is O(1) in
    // dim. Deterministic synthetic vectors (no RNG): x_ij = sin(i*1024+j).
    val df = spark.range(100).select(
      col("id"),
      transform(sequence(lit(0), lit(1023)), j => sin(col("id") * 1024 + j)).as("v"))
    val t0 = System.nanoTime()
    val buckets = df
      .withColumn("b", SimilarityJoin.cosineLshBucket(col("v"), dim = 1024, nbits = 8))
      .select("id", "b").as[(Long, Long)].collect().toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30.0, s"dim=1024 bucketing took $secs s — codegen blowup?")
    assert(buckets.values.toSet.size > 1, "all dim-1024 vectors in one bucket")
    // determinism: re-evaluate and compare
    val again = df
      .withColumn("b", SimilarityJoin.cosineLshBucket(col("v"), dim = 1024, nbits = 8))
      .select("id", "b").as[(Long, Long)].collect().toMap
    assert(again === buckets)
  }

  test("cosine LSH buckets: identical vectors share buckets, candidates shrink") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet").limit(200)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    val b = emb.withColumn("bkt", SimilarityJoin.cosineLshBucket(col("v"), dim = 64, nbits = 8))
    val nBuckets = b.select("bkt").distinct().count()
    assert(nBuckets > 1, "all vectors in one bucket — hashing degenerate")
    // same vector → same bucket (determinism)
    val twice = b.union(b).groupBy("vec_id").agg(countDistinct("bkt").as("n"))
      .filter(col("n") > 1).count()
    assert(twice === 0L)
  }

  test("lshTopK: scores exact, query found, recall floor, deterministic") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q   = emb.filter(col("vec_id") === 0).select(VectorOps.asDouble(col("embedding")).as("qvec"))
    val exact = SimilarityJoin.topK(emb, col("vec_id"), col("embedding"), q, 10)
      .as[(Long, Double)].collect().toMap
    val lsh = SimilarityJoin
      .lshTopK(emb, col("vec_id"), col("embedding"), 64, q, 10, tables = 16, bitsPerTable = 4)
      .as[(Long, Double)].collect()
    // Score-exactness law: only the candidate SET is approximate — every
    // returned (id, cos) must carry the same exact rerank score the
    // brute-force path computes for that id.
    val bruteAll = SimilarityJoin.topK(emb, col("vec_id"), col("embedding"), q, 100000)
      .as[(Long, Double)].collect().toMap
    lsh.foreach { case (id, cos) => assert(bruteAll(id) === cos, s"score drift for $id") }
    // The query vector hashes identically to itself in every table.
    assert(lsh.head._1 === 0L && math.abs(lsh.head._2 - 1.0) < 1e-9)
    // Recall floor (measured 10/10 at these params on the fixture, whose
    // true neighbors sit at cos ≈ 0.3 — the hard regime for LSH; the
    // floor leaves head-room for fixture regeneration, not for collapse).
    val recall = lsh.map(_._1).toSet.intersect(exact.keySet).size
    assert(recall >= 7, s"lshTopK recall collapsed: $recall/10")
    // Deterministic: hyperplanes are seeded from bit index, no RNG state.
    val again = SimilarityJoin
      .lshTopK(emb, col("vec_id"), col("embedding"), 64, q, 10, tables = 16, bitsPerTable = 4)
      .as[(Long, Double)].collect()
    assert(again.toSeq === lsh.toSeq)
  }

  test("lshProbe over a materialized index ≡ index-free lshTopK, row for row") {
    // The serving pair's equivalence law: buildLshIndex materializes the
    // SAME (id, t, key) assignment lshTopK computes inline (xxhash-seeded
    // hyperplanes, no RNG), so probing the stored tables returns the
    // identical top-k — materialization moves WHERE the bucket eval
    // happens, never what it returns. This is also what entitles the
    // d4_topk_lsh DuckDB oracle: an external reader of the index rows
    // reproduces the candidate set exactly.
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("lsh_idx").toString
    SimilarityJoin.buildLshIndex(emb, col("vec_id"), col("embedding"), dim = 64,
      path = dir, tables = 16, bitsPerTable = 4)
    for (qid <- Seq(0L, 7L, 42L)) {
      val q = emb.filter(col("vec_id") === qid)
        .select(VectorOps.asDouble(col("embedding")).as("qvec"))
      val inline = SimilarityJoin
        .lshTopK(emb, col("vec_id"), col("embedding"), 64, q, 10, tables = 16, bitsPerTable = 4)
        .as[(Long, Double)].collect().toSeq
      val probed = SimilarityJoin
        .lshProbe(spark, dir, emb, col("vec_id"), col("embedding"), 64, q, 10,
          tables = 16, bitsPerTable = 4)
        .as[(Long, Double)].collect().toSeq
      assert(probed === inline, s"probe drifted from inline for query $qid")
    }
    // the stored tables carry ids only — the index is id-sized, and a
    // probe's corpus access is the candidate-sized vector fetch
    val idxCols = spark.read.parquet(dir).columns.toSet
    assert(idxCols === Set("id", "t", "key"))
    // parameter mismatch refuses LOUDLY (the _params sidecar): probing
    // with different (tables, bits, dim) would slice the query over
    // different bit boundaries and return a silently-garbage candidate
    // set with exact-looking scores
    val q0 = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .filter(col("vec_id") === 0)
      .select(VectorOps.asDouble(col("embedding")).as("qvec"))
    val e = intercept[IllegalArgumentException] {
      SimilarityJoin.lshProbe(spark, dir,
        spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet"),
        col("vec_id"), col("embedding"), 64, q0, 10, tables = 8, bitsPerTable = 8)
    }
    assert(e.getMessage.contains("built with"), e.getMessage)
  }

  test("lshTopK: more tables never lose candidates (recall monotone in L)") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q   = emb.filter(col("vec_id") === 42).select(VectorOps.asDouble(col("embedding")).as("qvec"))
    val exact = SimilarityJoin.topK(emb, col("vec_id"), col("embedding"), q, 10)
      .select("vec_id").as[Long].collect().toSet
    // Table t of the L-table slicing hashes with the SAME hyperplanes
    // [t·bits, (t+1)·bits) regardless of L (slices are taken from the high
    // end of the wide bucket), so the candidate union — and hence recall —
    // is monotone in L. Measured on the fixture: 1, 5, 9 of 10.
    def recallAt(tables: Int): Int = SimilarityJoin
      .lshTopK(emb, col("vec_id"), col("embedding"), 64, q, 10, tables, bitsPerTable = 4)
      .select("vec_id").as[Long].collect().toSet.intersect(exact).size
    val (r1, r4, r16) = (recallAt(1), recallAt(4), recallAt(16))
    assert(r1 <= r4 && r4 <= r16, s"recall not monotone in tables: $r1, $r4, $r16")
    assert(r16 >= 7, s"16-table recall floor broken: $r16/10")
  }

  test("lshTopK: scaled duplicates always collide; planted near-dups survive aggressive bits") {
    // The regime LSH pruning is FOR: near-duplicate retrieval (cos ≥ 0.9).
    // Two laws on a corpus with planted duplicates of vec_ids 0..4:
    //  1. A positively-scaled copy (cos = 1) shares the sign of every
    //     projection, so it lands in the SAME bucket of EVERY table —
    //     retrieval is guaranteed, not probabilistic.
    //  2. A perturbed copy (w = v + 0.15·rot(v), cos ≈ 0.99 ⇒ p_bit ≈ 0.95)
    //     survives 8 tables × 6 bits — the aggressive-pruning setting that
    //     collapses on cos-0.3 neighbors (see the calibration above).
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    val base = emb.filter(col("vec_id") < 5)
    val scaled = base.select((col("vec_id") + 1000).as("vec_id"),
      expr("transform(v, x -> x * 2.0)").as("v"))
    val perturbed = base.select((col("vec_id") + 2000).as("vec_id"),
      expr("zip_with(v, transform(v, (x, i) -> v[(i + 1) % 64]), (a, b) -> a + 0.15 * b)").as("v"))
    val corpus = emb.union(scaled).union(perturbed)
    (0L until 5L).foreach { qid =>
      val q = base.filter(col("vec_id") === qid).select(col("v").as("qvec"))
      val got = SimilarityJoin
        .lshTopK(corpus, col("vec_id"), col("v"), 64, q, 10, tables = 8, bitsPerTable = 6)
        .select("vec_id").as[Long].collect().toSet
      assert(got.contains(qid + 1000), s"scaled dup of $qid missed — scale-invariance broken")
      assert(got.contains(qid + 2000), s"perturbed dup of $qid missed at 8×6")
    }
  }
}
