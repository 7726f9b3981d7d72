package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Embedding similarity search (SURVEY.md §2.D D3/D4/D9): brute-force
  * top-k as the exact baseline, IVF (inverted-file) bucketed ANN as the
  * scale path, and threshold self-join.
  *
  * 100 TB design:
  *  - `topK`: the query vector is a 1-row broadcast; scoring is a linear
  *    scan fused into codegen; the top-k plans as TakeOrderedAndProject
  *    (per-partition heaps + driver merge of k rows, never a global sort).
  *  - `ivfTopK`: centroid assignment keys the corpus once; a query probes
  *    `nprobe` buckets, reading ~nprobe/nlist of the data. Assignment is a
  *    broadcast join against the (small) centroid set.
  *  - `selfJoinThreshold`: exact within explicit blocks. All-pairs guards:
  *    callers must supply a blocking column; the operator refuses an
  *    unblocked self-join beyond a row threshold rather than silently
  *    planning a quadratic cross join.
  */
object SimilarityJoin {

  /** D4 baseline: exact top-k by cosine against one query vector. */
  def topK(
      emb: DataFrame,
      idCol: Column,
      vecCol: Column,
      query: DataFrame, // single row: (qvec array<double>)
      k: Int
  ): DataFrame = {
    val scored = emb
      .crossJoin(broadcast(query))
      .withColumn("cos", VectorOps.cosineNative(emb.sparkSession, VectorOps.asDouble(vecCol), col("qvec")))
    scored
      .select(idCol.as("vec_id"), round(col("cos"), 9).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** D4 (parallel-pair mining): margin-scored mutual-kNN pairs between a
    * source and a target embedding set — the Artetxe & Schwenk
    * margin criterion used to mine bitext / aligned training pairs:
    *
    *   margin(x, y) = cos(x, y) / ((avgₖ cos(x, kNN_tgt(x)) +
    *                                avgₖ cos(y, kNN_src(y))) / 2)
    *
    * A pair is emitted when y is in x's forward top-k AND x is in y's
    * backward top-k (mutual kNN) and its ratio margin clears `tau` —
    * the margin normalizes away "hub" vectors that are close to
    * everything, which plain cosine thresholds cannot.
    *
    * DETERMINISM: cosines quantize to integer NANO units (HALF_UP — one
    * deterministic per-value rounding), so the k-neighbor sums are exact
    * long arithmetic on any partitioning and the margin is a single
    * double division of two longs. Ranks tie-break by id. The neighbor
    * averages divide by the neighbors that EXIST (min(k, |side|)), so a
    * side smaller than k does not inflate margins.
    *
    * Scale shape: here exact — |src| × |tgt| scores, horizontally
    * partitioned, ranks via per-partition WindowGroupLimit. At corpus
    * scale the cross product is replaced by the IVF probes ([[ivfTopK]])
    * generating the forward/backward candidate lists; the margin math on
    * top is unchanged (sums are per-id, candidates-bounded). */
  def marginMining(
      src: DataFrame, // (sid, svec array<double>)
      tgt: DataFrame, // (tid, tvec array<double>)
      k: Int,
      tau: Double
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = src.sparkSession
    val scored = tgt
      .crossJoin(broadcast(src))
      .withColumn("cmicro",
        round(VectorOps.cosineNative(spark, col("svec"), col("tvec")) * 1e9, 0).cast("long"))
      .select(col("sid"), col("tid"), col("cmicro"))
    // ONE linear DAG: rank + top-k sum + top-k COUNT per side as window
    // functions over the rank window's own partitioning, so each side
    // costs a single exchange and the |src|×|tgt| scoring runs ONCE (a
    // groupBy+join-back here would fork the plan and re-execute the
    // cross product per consumer). The explicit neighbor COUNTS make the
    // denominator an average over the neighbors that EXIST — a side
    // smaller than k must not inflate margins (avg over min(k, n), the
    // paper's criterion), and the arithmetic stays exact longs:
    //   margin = 2·c·fcnt·bcnt / (fsum·bcnt + bsum·fcnt)
    // (≤ ~2^35 — one double division at the end).
    val fw = Window.partitionBy("sid").orderBy(col("cmicro").desc, col("tid"))
    val bw = Window.partitionBy("tid").orderBy(col("cmicro").desc, col("sid"))
    val fAgg = Window.partitionBy("sid")
    val bAgg = Window.partitionBy("tid")
    scored
      .withColumn("rf", row_number().over(fw))
      .withColumn("fsum", sum(when(col("rf") <= k, col("cmicro"))).over(fAgg))
      .withColumn("fcnt", sum(when(col("rf") <= k, lit(1L))).over(fAgg))
      .withColumn("rb", row_number().over(bw))
      .withColumn("bsum", sum(when(col("rb") <= k, col("cmicro"))).over(bAgg))
      .withColumn("bcnt", sum(when(col("rb") <= k, lit(1L))).over(bAgg))
      .filter(col("rf") <= k && col("rb") <= k)
      // the denominator CAN be exactly 0 (mutual-kNN cosines all
      // quantizing to 0, or negative sums canceling) — under ANSI mode an
      // unguarded Divide would fail the whole job with DIVIDE_BY_ZERO; a
      // zero-denominator pair has no defined margin and is dropped (the
      // NULL fails the tau filter), mirrored in the DuckDB oracle
      .withColumn("__den", col("fsum") * col("bcnt") + col("bsum") * col("fcnt"))
      .withColumn("margin",
        when(col("__den") =!= 0L,
          round(col("cmicro") * lit(2L) * col("fcnt") * col("bcnt") / col("__den"), 9)))
      .filter(col("margin") > tau)
      .select(col("sid"), col("tid"),
        (col("cmicro") / lit(1e9)).as("cos"), col("margin"))
  }

  /** D4, batched: top-k per query for a SET of query vectors — the shape a
    * serving/eval pipeline actually runs. The query set broadcasts; ranks
    * compute per query id via a window (plans WindowGroupLimit: per-
    * partition top-k before the shuffle). Work = |corpus| × |queries|
    * scores, horizontally partitioned on the corpus. */
  def topKBatch(
      emb: DataFrame,
      idCol: Column,
      vecCol: Column,
      queries: DataFrame, // (qid, qvec array<double>)
      k: Int
  ): DataFrame = {
    // r21 (guide §2.5): WindowGroupLimit prunes the rank ≤ k filter to a
    // per-partition top-k BEFORE the qid exchange — but on a 1-partition
    // corpus scan (single-row-group fixture) that "per-partition top-k"
    // was a single-core pass over the FULL |corpus|×|queries| cross
    // product (the r21 sf1 soak measured d3_knn_eval at 81× per 10×
    // rows: 40M scored rows sorted on one core). Adaptive keyed
    // rebalance splits the corpus first, so scoring and the group-limit
    // prune parallelize and the exchange carries ≤ partitions·|q|·k
    // rows. No-op on well-split inputs; row_number ties on
    // (cos desc, vec_id) are partitioning-independent.
    val scored = graft.tables.Tables
      .rebalanceForCpuBy(emb.select(idCol.as("__id"), vecCol.as("__vec")), col("__id"))
      .crossJoin(broadcast(queries))
      .withColumn("cos",
        VectorOps.cosineNative(emb.sparkSession, VectorOps.asDouble(col("__vec")), col("qvec")))
      .select(col("qid"), col("__id").as("vec_id"), round(col("cos"), 9).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** IVF index build: assign every vector to its nearest centroid. The
    * centroid set is any small deterministic sample (callers pass e.g.
    * `vec_id % stride = 0` rows); nlist centroids broadcast to executors. */
  def ivfAssign(emb: DataFrame, idCol: Column, vecCol: Column, centroids: DataFrame): DataFrame = {
    // centroids: (cid, cvec array<double>). Assignment is NARROW: the
    // centroid table collapses to ONE broadcast row holding the
    // cid-sorted (cid, cvec) array, and every vector argmaxes over it in
    // place — nlist native cosines per row, zero corpus fanout, zero
    // shuffle, zero join-back. (The old shape crossJoined the corpus
    // against the centroids and re-grouped by id — a corpus-sized
    // exchange plus a corpus self-join just to reattach `v`.) Tie-break
    // matches max_by(struct(sim, -cid)) exactly: the per-element struct
    // is (sim, -cid, cid), so array_max picks highest sim then LOWEST
    // cid, on the identical native-cosine values.
    val packed = centroids.agg(
      array_sort(collect_list(struct(col("cid"), col("cvec")))).as("cents"))
    emb
      .select(idCol.as("id"), VectorOps.asDouble(vecCol).as("v"))
      .crossJoin(broadcast(packed)) // 1 row: a broadcast scalar, not a data join
      .select(
        col("id"), col("v"),
        array_max(transform(
          col("cents"),
          c => struct(
            VectorOps.cosineNative(emb.sparkSession, col("v"), c.getField("cvec")).as("sim"),
            (-c.getField("cid")).as("ncid"),
            c.getField("cid").as("cid"))))
          .getField("cid").as("cid"))
      .filter(col("cid").isNotNull) // empty centroid table → no assignments (old inner-join semantics)
  }

  /** Deterministic Lloyd refinement for IVF centroids: `iters` k-means
    * steps — assign every vector to its nearest seed (cosine), recompute
    * each centroid as the coordinate-wise mean of its cluster. Seeds that
    * attract no vectors drop out (nlist may shrink). Fully distributed: one
    * broadcast-join assignment plus one (cid, position) aggregation per
    * iteration — no vectors ever pass through the driver, so nlist and dim
    * scale to whatever the broadcast threshold allows. */
  def lloydRefine(
      emb: DataFrame,
      idCol: Column,
      vecCol: Column,
      seeds: DataFrame, // (cid, cvec array<double>)
      iters: Int
  ): DataFrame = {
    // Each step's centroid frame is eagerly checkpointed: it is nlist
    // rows (KBs), but left lazy the steps compound — step i re-executes
    // steps 1..i−1's corpus passes inside its own broadcast subtree,
    // turning `iters` assignment scans into O(iters²).
    var c = seeds.localCheckpoint()
    for (_ <- 1 to iters)
      // Recompute via the whole-vector aggregator (functions/VectorAgg):
      // quantize to the 1e-9 micro-grid, sum ARRAYS per cluster — one
      // ObjectHashAggregate instead of the d× posexplode + re-group +
      // collect_list reassembly, and the mean is EXACT integer arithmetic
      // under any partitioning (the old avg(double) summed in shuffle
      // arrival order, so the fitted centroids were only stable by
      // local-mode accident). 1e-9 per-component quantization is far
      // below any cosine-assignment decision boundary the laws probe.
      c = graft.functions.VectorAgg
        .sumCentroids(ivfAssign(emb, idCol, vecCol, c), col("cid"), col("v"))
        .localCheckpoint()
    c
  }

  /** D4 scale path: IVF top-k — probe the `nprobe` centroids nearest the
    * query, scan only their buckets. Approximate; recall measured in
    * SimilaritySpec against the exact baseline. */
  def ivfTopK(
      emb: DataFrame,
      idCol: Column,
      vecCol: Column,
      centroids: DataFrame,
      query: DataFrame,
      k: Int,
      nprobe: Int
  ): DataFrame = {
    val assigned = ivfAssign(emb, idCol, vecCol, centroids)
    val probes = centroids
      .crossJoin(broadcast(query))
      .withColumn("csim", VectorOps.cosineNative(emb.sparkSession, col("cvec"), col("qvec")))
      .orderBy(col("csim").desc, col("cid"))
      .limit(nprobe)
      .select(col("cid"))
    assigned
      .join(broadcast(probes), "cid")
      .crossJoin(broadcast(query))
      .withColumn("cos", VectorOps.cosineNative(emb.sparkSession, col("v"), col("qvec")))
      .select(col("id").as("vec_id"), round(col("cos"), 9).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Offline half of the IVF serving pair: assign every vector to its
    * centroid ONCE and write the index partitioned by `cid`, with the
    * centroid table stored under `_centroids` inside the same directory
    * (underscore prefix: parquet readers of the index path ignore it, so
    * one directory is the whole self-describing index). Assignment is the
    * expensive, query-independent part — [[ivfTopK]] recomputes it per
    * query, which is fine for a one-shot batch job but wrong for serving;
    * after this build, [[ivfProbe]] reads only the probed partitions. */
  def buildIvfIndex(
      emb: DataFrame,
      idCol: Column,
      vecCol: Column,
      centroids: DataFrame,
      path: String
  ): Unit = {
    ivfAssign(emb, idCol, vecCol, centroids)
      .write
      .mode("overwrite")
      .partitionBy("cid")
      .parquet(path)
    centroids.write.mode("overwrite").parquet(s"$path/_centroids")
    writeIndexStats(emb.sparkSession, path)
  }

  /** [[buildIvfIndex]] with int8-quantized vectors: stores (id, q, sc,
    * cid) where q = symmetric maxabs int8 codes and sc the per-vector
    * scale — ~4x less index storage/scan bandwidth than float64 working
    * vectors, which at 100 TB decides whether the probed partitions live
    * in page cache. [[ivfProbe]] detects the quantized layout from the
    * schema and dequantizes on read; recall/error laws in SimilaritySpec. */
  def buildIvfIndexQuantized(
      emb: DataFrame,
      idCol: Column,
      vecCol: Column,
      centroids: DataFrame,
      path: String
  ): Unit = {
    ivfAssign(emb, idCol, vecCol, centroids)
      .withColumn("sc", VectorOps.maxAbsScale(col("v")))
      .select(
        col("id"),
        VectorOps.quantizeI8(col("v"), col("sc")).as("q"),
        col("sc"),
        col("cid"))
      .write
      .mode("overwrite")
      .partitionBy("cid")
      .parquet(path)
    centroids.write.mode("overwrite").parquet(s"$path/_centroids")
    writeIndexStats(emb.sparkSession, path)
  }

  /** Build-time quality baseline, stored INSIDE the index as `_stats`
    * (underscore prefix: invisible to parquet readers of the index path,
    * like `_centroids`): per cid, the member count and mean/min cosine to
    * the centroid at build time — the reference point [[ivfDriftStats]]
    * compares arriving shards against. Computed by reading the index back
    * (one pass over the just-written, already-partitioned rows — cheaper
    * than checkpointing the corpus-sized assignment to dual-consume it),
    * so it measures exactly what probes will see: the quantized index's
    * baseline is over the DEQUANTIZED vectors. [[addToIvfIndex]] leaves
    * `_stats` untouched by design — the baseline is the build, and drift
    * of later adds is measured against it; call this again only to
    * re-baseline deliberately (e.g. after a rebuild). */
  def writeIndexStats(spark: org.apache.spark.sql.SparkSession, indexPath: String): Unit = {
    val centroids = spark.read.parquet(s"$indexPath/_centroids")
    val idx       = spark.read.parquet(indexPath)
    val vecs =
      if (idx.columns.contains("q"))
        idx.withColumn("v", VectorOps.dequantizeI8(col("q"), col("sc")))
      else idx
    vecs
      .join(broadcast(centroids), "cid")
      .withColumn("sim", VectorOps.cosineNative(spark, col("v"), col("cvec")))
      .groupBy(col("cid"))
      .agg(
        count(lit(1)).as("n_built"),
        round(avg(col("sim")), 6).as("build_mean_sim"),
        round(min(col("sim")), 6).as("build_min_sim"))
      .write
      .mode("overwrite")
      .parquet(s"$indexPath/_stats")
  }

  /** Incremental index maintenance: assign a NEW embedding shard to the
    * EXISTING materialized `_centroids` and APPEND to the cid partitions —
    * the ANN twin of the signature store's incremental dedup
    * ([[graft.pipelines.CorpusPrep.prepareIncremental]]): a new shard costs
    * one shard-sized broadcast-join assignment plus partition-local
    * appends, never the full-corpus shuffle of a rebuild (VERDICT r6
    * missing-2). The quantized layout is detected from the existing index
    * schema so both index flavors grow through one entry point.
    *
    * Probe equivalence is exact, not approximate: [[ivfProbe]] scans every
    * file in the probed cid partitions regardless of which build or add
    * wrote it, and assignment against FIXED centroids is deterministic —
    * so probe(add(build(A), B)) ≡ probe(build(A ∪ B, same centroids))
    * row-for-row (SimilaritySpec law). Ids must be disjoint from rows
    * already indexed; appends are atomic per task file, but a failed job
    * can leave a partial shard — re-run with the same data only after
    * removing it (or build toward a staging dir and move, as a production
    * deployment would).
    *
    * Drift caveat: the centroids stay where Lloyd left them, so recall
    * degrades as the ADDED distribution shifts from the built one (new
    * domains, new embedding model) — cid list sizes skew and probes read
    * more irrelevant vectors. Monitor the per-cid row-count skew (a
    * one-groupBy audit); when the max/mean ratio drifts past ~4× or
    * cumulative adds exceed the original corpus size, re-run
    * [[lloydRefine]] + [[buildIvfIndex]] — the rebuild cost is then paid
    * once, deliberately, not per shard. */
  def addToIvfIndex(
      newEmb: DataFrame,
      idCol: Column,
      vecCol: Column,
      indexPath: String
  ): Unit = {
    val spark     = newEmb.sparkSession
    val centroids = spark.read.parquet(s"$indexPath/_centroids")
    val assigned  = ivfAssign(newEmb, idCol, vecCol, centroids)
    val rows =
      if (spark.read.parquet(indexPath).columns.contains("q"))
        assigned
          .withColumn("sc", VectorOps.maxAbsScale(col("v")))
          .select(
            col("id"),
            VectorOps.quantizeI8(col("v"), col("sc")).as("q"),
            col("sc"),
            col("cid"))
      else assigned
    rows.write.mode("append").partitionBy("cid").parquet(indexPath)
  }

  /** Index health audit — the drift monitor [[addToIvfIndex]]'s caveat
    * prescribes: per-centroid row counts, one row per cid. Probe cost is
    * proportional to the probed lists' sizes, so skew here IS the recall/
    * latency drift signal: `max(n) / avg(n)` creeping past ~4× (or total
    * adds passing the built corpus size) means the centroids no longer
    * describe the data — re-run [[lloydRefine]] + [[buildIvfIndex]].
    * One partition-local count per cid (the index is partitioned by cid,
    * so this never shuffles data, only the nlist count rows). */
  def ivfIndexStats(spark: org.apache.spark.sql.SparkSession, indexPath: String): DataFrame =
    spark.read
      .parquet(indexPath)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n"))

  /** Pre-add drift check — the QUALITY half of the drift monitor
    * ([[ivfIndexStats]] catches distribution skew by count; this catches
    * a shard that is uniformly spread but FAR from every centroid, which
    * count skew cannot see). Assigns the incoming shard to the existing
    * materialized centroids WITHOUT writing and reports, per centroid,
    * how well the centroid still describes its new members — (cid, n_new,
    * mean_sim, min_sim) — PLUS the comparison against the build-time
    * baseline the builds persist under `_stats` ([[writeIndexStats]]):
    * `build_mean_sim` and `drift = build_mean_sim - mean_sim`. A drift
    * pulling away from 0 is the re-run-Lloyd signal [[addToIvfIndex]]'s
    * caveat prescribes, now computed against a STORED reference instead
    * of one the operator merely documents. Baseline columns are null for
    * a cid the build saw no members for, or for a pre-`_stats` index
    * directory. Cost: one broadcast-join assignment over the shard plus
    * one nlist-row `_stats` read — never touches the stored index rows. */
  def ivfDriftStats(
      newEmb: DataFrame,
      idCol: Column,
      vecCol: Column,
      indexPath: String
  ): DataFrame = {
    val spark     = newEmb.sparkSession
    val centroids = spark.read.parquet(s"$indexPath/_centroids")
    val statsPath = new org.apache.hadoop.fs.Path(s"$indexPath/_stats")
    val fs        = statsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val baseline =
      if (fs.exists(statsPath))
        spark.read.parquet(statsPath.toString).select(col("cid"), col("build_mean_sim"))
      else // index predates the _stats contract: report shard stats, null baseline
        centroids.select(col("cid"), lit(null).cast("double").as("build_mean_sim"))
    ivfAssign(newEmb, idCol, vecCol, centroids)
      .join(broadcast(centroids), "cid")
      .withColumn("sim", VectorOps.cosineNative(spark, col("v"), col("cvec")))
      .groupBy(col("cid"))
      .agg(
        count(lit(1)).as("n_new"),
        round(avg(col("sim")), 6).as("mean_sim"),
        round(min(col("sim")), 6).as("min_sim"))
      .join(broadcast(baseline), Seq("cid"), "left")
      .withColumn("drift", round(col("build_mean_sim") - col("mean_sim"), 6))
  }

  /** Online half: top-k against a prebuilt [[buildIvfIndex]] directory.
    * The query is scored against the (small) centroid table first; the
    * winning `nprobe` centroid ids become a PARTITION filter on the index
    * scan, so the job reads ~nprobe/nlist of the corpus from disk — no
    * full-corpus assignment, no full-corpus scan (partition pruning
    * asserted in SimilaritySpec). The only driver-side value is the
    * nprobe-length centroid-id list — bounded by configuration, not data
    * (same class as an iterative algorithm's convergence scalar). */
  def ivfProbe(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      query: DataFrame, // single row: (qvec array<double>)
      k: Int,
      nprobe: Int,
      // Filtered vector search against the index: a (vec_id) frame of ids
      // passing a metadata predicate, semi-joined against the PRUNED
      // candidate slice before the rerank — the post-probe metadata-join
      // strategy. Both join sides arrive pruned (the index side to
      // ~nprobe/nlist of the corpus, the metadata side by its pushed-down
      // predicate), so the equi-join never sees corpus-sized inputs.
      // Callers should raise nprobe to over-fetch against the filter's
      // selectivity (a probed partition may hold few passing rows).
      keep: Option[DataFrame] = None
  ): DataFrame = {
    val centroids = spark.read.parquet(s"$indexPath/_centroids")
    val probeIds = centroids
      .crossJoin(broadcast(query))
      .withColumn("csim", VectorOps.cosineNative(spark, col("cvec"), col("qvec")))
      .orderBy(col("csim").desc, col("cid"))
      .limit(nprobe)
      .select(col("cid").cast("long"))
      .collect()
      .map(_.getLong(0))
    val idx = spark.read
      .parquet(indexPath)
      .filter(col("cid").isin(probeIds.toIndexedSeq: _*)) // prunes to nprobe partitions
    val vecs =
      if (idx.columns.contains("q")) // quantized layout: dequantize on read
        idx.withColumn("v", VectorOps.dequantizeI8(col("q"), col("sc")))
      else idx
    val kept = keep match {
      case Some(ids) => vecs.join(ids.select(col("vec_id").as("id")), Seq("id"), "left_semi")
      case None      => vecs
    }
    kept
      .crossJoin(broadcast(query))
      .withColumn("cos", VectorOps.cosineNative(spark, col("v"), col("qvec")))
      .select(col("id").as("vec_id"), round(col("cos"), 9).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** D9: exact similarity self-join within blocks: pairs (a < b) sharing
    * `blockCol` with cosine >= threshold. The block key is the shuffle key,
    * so work scales with sum(block²), not corpus².
    *
    * All-pairs guard: a CONSTANT block column (`lit(0)` — every row in one
    * block) makes this a corpus² join, fine for a spec fixture and a
    * silent disaster at 100 TB. When the block expression is a literal and
    * the input's optimizer-estimated size exceeds `maxUnblockedBytes`
    * (default 1 GiB; 0 disables), the operator REFUSES at plan time —
    * the estimate comes from the logical plan's stats, so the check costs
    * no job — and points callers at the blocked alternatives
    * ([[lshSelfJoinThreshold]], [[ivfAssign]]-derived blocks). */
  def selfJoinThreshold(
      emb: DataFrame,
      idCol: Column,
      vecCol: Column,
      blockCol: Column,
      threshold: Double,
      maxUnblockedBytes: Long = 1L << 30
  ): DataFrame = {
    // Constant ⇔ the analyzed block expression references no input column
    // (covers lit(...), expressions of literals, …). Analysis only — no job.
    val constantBlock = emb.select(blockCol).queryExecution.analyzed match {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.headOption.exists(_.references.isEmpty)
      case _ => false
    }
    if (constantBlock && maxUnblockedBytes > 0) {
      val est = emb.queryExecution.optimizedPlan.stats.sizeInBytes
      require(
        est <= maxUnblockedBytes,
        s"selfJoinThreshold: constant block column over an estimated $est-byte input plans an " +
          "ALL-PAIRS join. Block on a real key, generate candidates with lshSelfJoinThreshold " +
          "or nearest-centroid (ivfAssign) blocks, or raise maxUnblockedBytes deliberately.")
    }
    val side = emb.select(
      blockCol.as("blk"),
      idCol.as("id"),
      VectorOps.asDouble(vecCol).as("v")
    )
    val l = side.select(col("blk").as("blk_l"), col("id").as("id_a"), col("v").as("v_a"))
    val r = side.select(col("blk").as("blk_r"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, col("blk_l") === col("blk_r") && col("id_a") < col("id_b"))
      .withColumn("cos", VectorOps.cosineNative(emb.sparkSession, col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 9).as("cos"))
  }

  /** D9 scale path: approximate threshold self-join — random-hyperplane
    * LSH buckets generate candidates (vectors in the same table's bucket
    * agree on all of its `nbits` projections), exact cosine verifies, so
    * PRECISION is exact and only recall is probabilistic.
    *
    * `tables` is the standard OR-construction: the union of `tables`
    * independent hash tables' candidates — per-pair recall
    * 1-(1-p^nbits)^tables for bit-agreement probability p = 1-θ/π. One
    * table of 2 bits recalls ~36% of cos-0.3 pairs; four tables recall
    * ~84% (floors in SimilaritySpec). Implemented exactly like
    * [[lshTopK]]: ONE wide `tables·nbits`-bit bucket per row, bit-sliced
    * into independent tables (hyperplanes seeded per bit index), so the
    * hash cost is one native-codegen expression regardless of `tables`.
    *
    * Work is `tables · Σ bucket²` pair candidates plus one
    * (id_a, id_b) dedup before verification (a pair can collide in
    * several tables; verifying it once keeps the exact-cosine cost
    * per-pair, not per-collision). Recall rises with `tables`, falls
    * with `nbits`; cost moves the other way. Measured against the exact
    * join in SimilaritySpec (pair containment, cluster refinement,
    * recall floors).
    *
    * `maxBucketSize` (0 = uncapped) is the quadratic-blowup guard, the
    * embedding twin of [[graft.operators.Dedup.MinHashParams]]'
    * bucket cap: a (table, key) bucket larger than the cap contributes NO
    * candidates — an oversized bucket means the hash is not
    * discriminating there, and paying Σ bucket² on it is the exact
    * failure mode that turns LSH into an all-pairs join on data the
    * hyperplanes cannot split (near-isotropic regions, degenerate spam
    * clusters). With the cap, worst-case candidate count is bounded by
    * `tables · n · cap` — LINEAR in the corpus — at the price of recall
    * inside dropped buckets (other tables may still catch those pairs).
    * Set it in production; leave 0 only for corpora whose geometry is
    * known to bucket (SimilaritySpec pins both behaviors). */
  def lshSelfJoinThreshold(
      emb: DataFrame,
      idCol: Column,
      vecCol: Column,
      dim: Int,
      threshold: Double,
      nbits: Int = 8,
      tables: Int = 1,
      maxBucketSize: Int = 0
  ): DataFrame = {
    requireLshParams(tables, nbits)
    val bucketed = lshBucketRows(emb, idCol, vecCol, dim, nbits, tables)
    val side =
      if (maxBucketSize <= 0) bucketed
      else { // one count per (t, key) partition — same shuffle the join pays
        val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("t"), col("key"))
        bucketed
          .withColumn("__bucket_n", count(lit(1)).over(wc))
          .filter(col("__bucket_n") <= maxBucketSize)
          .drop("__bucket_n")
      }
    val l = side.select(col("t").as("t_l"), col("key").as("key_l"), col("id").as("id_a"), col("v").as("v_a"))
    val r = side.select(col("t").as("t_r"), col("key").as("key_r"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, col("t_l") === col("t_r") && col("key_l") === col("key_r") && col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b") // verify each pair once, not per colliding table
      .withColumn("cos", VectorOps.cosineNative(emb.sparkSession, col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 9).as("cos"))
  }

  /** D4 scale path #2: multi-table LSH top-k — the index-free ANN probe.
    *
    * Where IVF needs an offline build (centroids + assignment), this path
    * answers a query against raw embeddings with one corpus scan that
    * touches only hash-colliding rows after the join prunes: `tables`
    * independent random-hyperplane hash tables of `bitsPerTable` bits
    * each, computed as ONE wide `tables·bitsPerTable`-bit bucket per row
    * ([[cosineLshBucket]], native codegen) and bit-sliced — hyperplanes
    * are seeded per bit index, so disjoint bit ranges ARE independent
    * tables, for one expression eval instead of `tables`.
    *
    * Candidates = union over tables of rows sharing the query's slice
    * (expected corpus/2^bitsPerTable per table); exact cosine reranks, so
    * returned SCORES are exact — only the candidate SET is approximate
    * (recall law + score-exactness law in SimilaritySpec). Recall rises
    * with `tables`, cost falls with `bitsPerTable`.
    *
    * 100 TB shape: scan → posexplode(tables) → broadcast-join on the
    * (table, key) pair → per-id dedup over the (small) candidate set →
    * TakeOrderedAndProject. No offline artifact, no full-corpus shuffle;
    * the only wide op is the candidate dedup. */
  def lshTopK(
      emb: DataFrame,
      idCol: Column,
      vecCol: Column,
      dim: Int,
      query: DataFrame, // single row: (qvec array<double>)
      k: Int,
      tables: Int = 8,
      bitsPerTable: Int = 8
  ): DataFrame = {
    requireLshParams(tables, bitsPerTable)
    val spark = emb.sparkSession
    val nbits = tables * bitsPerTable
    val corpus = emb
      .select(idCol.as("id"), VectorOps.asDouble(vecCol).as("v"))
      .select(col("id"), col("v"),
        posexplode(lshSlices(cosineLshBucket(col("v"), dim, nbits), tables, bitsPerTable))
          .as(Seq("t", "key")))
    val qKeyed = query
      .select(col("qvec"),
        posexplode(lshSlices(cosineLshBucket(col("qvec"), dim, nbits), tables, bitsPerTable))
          .as(Seq("qt", "qkey")))
    corpus
      .join(broadcast(qKeyed), col("t") === col("qt") && col("key") === col("qkey"))
      .dropDuplicates("id") // a row can collide in several tables
      .withColumn("cos", VectorOps.cosineNative(spark, col("v"), col("qvec")))
      .select(col("id").as("vec_id"), round(col("cos"), 9).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** The multi-table bit-slicing shared by [[lshTopK]], [[lshSelfJoinThreshold]],
    * [[buildLshIndex]] and [[lshProbe]] — ONE definition, because the
    * slicing IS the contract that keeps a materialized index
    * row-identical to the inline eval (and the DuckDB oracle honest):
    * table t's hyperplanes are [t·bits, (t+1)·bits) taken from the HIGH
    * end of the wide bucket, so a table's keys are independent of the
    * total table count — adding tables only ADDS tables. */
  /** The hyperplane-LSH bucket rows (id, v, t, key) behind
    * [[lshSelfJoinThreshold]] — exposed so a session can MATERIALIZE the
    * hash half as an oracle artifact from the same code path the query
    * runs (the d4-index contract: the artifact cannot drift from the
    * operator). */
  def lshBucketRows(
      emb: DataFrame,
      idCol: Column,
      vecCol: Column,
      dim: Int,
      nbits: Int,
      tables: Int): DataFrame = {
    requireLshParams(tables, nbits)
    emb
      .select(idCol.as("id"), VectorOps.asDouble(vecCol).as("v"))
      .select(col("id"), col("v"),
        posexplode(lshSlices(cosineLshBucket(col("v"), dim, tables * nbits), tables, nbits))
          .as(Seq("t", "key")))
  }

  private def lshSlices(wide: Column, tables: Int, bitsPerTable: Int): Column = {
    val mask = (1L << bitsPerTable) - 1
    array((0 until tables).map(t =>
      shiftright(wide, (tables - 1 - t) * bitsPerTable).bitwiseAND(lit(mask))): _*)
  }

  private def requireLshParams(tables: Int, bitsPerTable: Int): Unit = {
    require(tables >= 1 && bitsPerTable >= 1, "tables and bitsPerTable must be >= 1")
    require(tables * bitsPerTable <= 64, "tables * bitsPerTable must fit in one long")
  }

  /** Offline half of the LSH serving pair ([[lshTopK]] is the index-free
    * one-shot): materialize the corpus's multi-table bucket assignment as
    * (id, t, key) rows — the hash tables a production LSH deployment
    * stores — plus a `_params` sidecar (tables, bitsPerTable, dim) so
    * probes can refuse a parameter mismatch instead of silently joining
    * across different bit boundaries. The rows carry NO vectors (the
    * index is id-sized, not corpus-sized); [[lshProbe]] fetches only the
    * colliding candidates' vectors for the exact rerank. Deterministic
    * (xxhash-seeded hyperplanes, no RNG), so the index doubles as an
    * ORACLE artifact: an external engine reading these rows reproduces
    * the candidate set exactly — including the query's own keys when the
    * query vector is a corpus member (its (t, key) rows ARE the probe). */
  def buildLshIndex(
      emb: DataFrame,
      idCol: Column,
      vecCol: Column,
      dim: Int,
      path: String,
      tables: Int = 8,
      bitsPerTable: Int = 8
  ): Unit = {
    requireLshParams(tables, bitsPerTable)
    emb
      .select(idCol.as("id"), VectorOps.asDouble(vecCol).as("v"))
      .select(col("id"),
        posexplode(lshSlices(cosineLshBucket(col("v"), dim, tables * bitsPerTable),
          tables, bitsPerTable)).as(Seq("t", "key")))
      .write.mode("overwrite").parquet(path)
    import emb.sparkSession.implicits._
    Seq((tables, bitsPerTable, dim)).toDF("tables", "bits_per_table", "dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_params")
  }

  /** Online half: top-k against a [[buildLshIndex]] directory. The query
    * hashes against the same seeded hyperplanes (one expression eval);
    * candidates are the index rows sharing any (table, key) slice with
    * it — an equi-join against id-sized hash tables, never a corpus
    * scan — then the candidates' vectors are fetched from `emb` by id
    * (broadcast semi-join, candidate-sized) and exact cosine reranks.
    * Row-identical to [[lshTopK]] on the same (tables, bitsPerTable)
    * parameters (law in SimilaritySpec): materializing the tables moves
    * WHERE the bucket eval happens, never what it returns. The caller's
    * parameters are validated against the index's `_params` sidecar —
    * a mismatch would slice the query over different bit boundaries and
    * return a silently-garbage candidate set with exact-looking scores
    * (pre-sidecar indexes skip the check). */
  def lshProbe(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      emb: DataFrame,
      idCol: Column,
      vecCol: Column,
      dim: Int,
      query: DataFrame, // single row: (qvec array<double>)
      k: Int,
      tables: Int = 8,
      bitsPerTable: Int = 8
  ): DataFrame = {
    requireLshParams(tables, bitsPerTable)
    val paramsPath = new org.apache.hadoop.fs.Path(s"$indexPath/_params")
    if (paramsPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(paramsPath)) {
      val p = spark.read.parquet(paramsPath.toString)
        .select(col("tables").cast("int"), col("bits_per_table").cast("int"),
          col("dim").cast("int")).head()
      require(p.getInt(0) == tables && p.getInt(1) == bitsPerTable && p.getInt(2) == dim,
        s"LSH index at $indexPath was built with (tables=${p.getInt(0)}, " +
          s"bitsPerTable=${p.getInt(1)}, dim=${p.getInt(2)}) — probe called with " +
          s"($tables, $bitsPerTable, $dim); a mismatch would join across different " +
          "bit boundaries and return a silently-wrong candidate set")
    }
    val qKeyed = query
      .select(col("qvec"),
        posexplode(lshSlices(cosineLshBucket(col("qvec"), dim, tables * bitsPerTable),
          tables, bitsPerTable)).as(Seq("qt", "qkey")))
    val cand = spark.read.parquet(indexPath)
      .join(broadcast(qKeyed), col("t") === col("qt") && col("key") === col("qkey"))
      .select(col("id"))
      .dropDuplicates("id") // a row can collide in several tables
    emb
      .select(idCol.as("id"), VectorOps.asDouble(vecCol).as("v"))
      .join(broadcast(cand), "id")
      .crossJoin(broadcast(query))
      .withColumn("cos", VectorOps.cosineNative(spark, col("v"), col("qvec")))
      .select(col("id").as("vec_id"), round(col("cos"), 9).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** D9 composed: SemDeDup-style embedding-space deduplication — the
    * standard semantic dedup pass a pretraining pipeline runs AFTER text
    * dedup (near-identical meaning, different surface forms): cosine-near
    * pairs within blocks → connected components → the minimum-id vector of
    * each cluster survives, consistent with the text paths' keep-lowest-id
    * policy ([[graft.operators.Dedup.exact]], CorpusPrep's cluster rule).
    *
    * 100 TB shape: pair generation is the blocked equi-join of
    * [[selfJoinThreshold]] (Σ block² work, never corpus²); clustering is
    * the O(log n)-round large-star/small-star CC; the survivor filter is
    * one anti-join. For unblocked corpora swap the pair generator for
    * [[lshSelfJoinThreshold]] — the composition is identical from `pairs`
    * down. Returns the surviving rows of `emb`, schema unchanged. */
  def semanticDedup(
      emb: DataFrame,
      idCol: Column,
      vecCol: Column,
      blockCol: Column,
      threshold: Double
  ): DataFrame = {
    val pairs = selfJoinThreshold(emb, idCol, vecCol, blockCol, threshold)
      .select(col("id_a"), col("id_b"))
    val losers = graft.operators.Dedup
      .connectedComponents(pairs)
      .filter(col("node") =!= col("cluster")) // survivor: node == cluster min
      .select(col("node").as("__loser"))
    emb.join(losers, idCol === col("__loser"), "left_anti")
  }

  /** Random-hyperplane LSH bucketing for cosine: `nbits` signed projections
    * against deterministic pseudo-random hyperplanes (seeded per bit from
    * the dimension index via a hash — no RNG state, reproducible anywhere).
    * Near-dup candidate generation for D9's 100 TB path; recall is
    * probabilistic and measured in tests, so it is not the oracle query.
    *
    * Backed by the native codegen expression
    * [[graft.catalyst.CosineLshBucketExpression]]: O(1) expression-tree
    * size in `dim` (the sign matrix is precomputed runtime data, not
    * inlined literals), so production embedding dims (1024–4096) stay
    * inside whole-stage codegen instead of blowing the method-size limit
    * (VERDICT r4 §wrong-1). Bucket values are unchanged — bit-equality
    * with the old declarative form asserted in SimilaritySpec. */
  def cosineLshBucket(vec: Column, dim: Int, nbits: Int): Column = {
    graft.catalyst.GraftExtensions.register(org.apache.spark.sql.SparkSession.active)
    call_function("graft_lsh_bucket", vec, lit(dim), lit(nbits))
  }
}
