package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Product quantization for ANN at scale (SURVEY §2.D D4 scale path;
  * Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011): split every (L2-normalized) vector into `m`
  * contiguous subspaces, k-means each subspace into `ksub` codewords, and
  * store each vector as `m` small codes. A 64-dim float64 vector (512 B)
  * becomes 8 codes (8 B as int8-able values) — a ~64× working-set shrink,
  * which at 100 TB is the difference between an index that lives in page
  * cache and one that doesn't. Queries score against the CODES via ADC
  * (asymmetric distance computation): one m×ksub lookup table per query,
  * then score(x) = Σ_s table[s][code_s(x)] — the scan never touches the
  * original vectors.
  *
  * Design choices, and what they trade:
  *  - Vectors are L2-NORMALIZED before encoding, so inner product =
  *    cosine and the ADC score approximates the cosine every other D4
  *    operator ranks by (same contract as the int8 IVF index).
  *  - Codebooks are trained with the same deterministic machinery as
  *    [[SimilarityJoin.lloydRefine]]: stride-sampled seeds + joint Lloyd
  *    iterations over ALL subspaces at once (keyed (sub, code) — m
  *    codebooks per pass, not m passes), so builds are reproducible on
  *    any cluster. No RNG anywhere.
  *  - This is FLAT PQ: codes quantize the vector itself, not the residual
  *    v − centroid. It composes with the IVF index (partition-prune on
  *    cid, ADC-score the codes inside probed partitions); residual
  *    encoding would buy extra precision per code at the cost of coupling
  *    the codebooks to the coarse quantizer — the flat form keeps the two
  *    indexes independently rebuildable.
  *
  * 100 TB plan shapes: codebook training is `iters` broadcast-join +
  * keyed-agg passes over the (id, sub) exploded frame; encoding is ONE
  * such pass; ADC serving scans only the codes frame with a broadcast
  * m·ksub map — no corpus-sized shuffle anywhere, no driver-side vectors.
  * Approximation quality (recall vs exact top-k, ADC ≡ reconstructed-dot)
  * is law-tested in ProductQuantizerSpec.
  */
object ProductQuantizer {

  final case class PqParams(
      dim: Int = 64,
      m: Int = 16,
      ksub: Int = 64,
      iters: Int = 3,
      seedStride: Long = 7L
  ) {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    require(ksub >= 2 && iters >= 0 && seedStride >= 1)
    require(ksub <= 256, s"ksub=$ksub exceeds 256 — PQ codes are byte-sized by design")
    def dsub: Int = dim / m
  }

  /** (id, sub, sv): each normalized vector exploded into its `m`
    * sub-vectors — the working grain of training and encoding. */
  private def subRows(emb: DataFrame, idCol: Column, vecCol: Column, p: PqParams): DataFrame =
    emb
      .select(
        idCol.cast("long").as("id"),
        VectorOps.normalize(VectorOps.asDouble(vecCol)).as("v"))
      .select(
        col("id"),
        explode(
          transform(
            sequence(lit(0), lit(p.m - 1)),
            s => struct(s.as("sub"), slice(col("v"), s * p.dsub + 1, lit(p.dsub)).as("sv"))))
          .as("e"))
      .select(col("id"), col("e.sub").as("sub"), col("e.sv").as("sv"))

  /** Deterministic seed codebooks: the first `ksub` stride-sampled vectors
    * donate their sub-vectors as initial codewords (code = rank of the
    * donor id — the row_number window runs over ksub rows, never data).
    * Same no-RNG convention as the IVF centroid sample. */
  def seedCodebooks(emb: DataFrame, idCol: Column, vecCol: Column, p: PqParams): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
    val donors = emb
      .select(idCol.cast("long").as("id"))
      .filter(pmod(col("id"), lit(p.seedStride)) === 0)
      .orderBy(col("id"))
      .limit(p.ksub)
      .withColumn("code", (row_number().over(w) - 1))
    subRows(emb, idCol, vecCol, p)
      .join(broadcast(donors), "id")
      .select(col("sub"), col("code"), col("sv").as("cw"))
  }

  /** Squared L2 over a KNOWN small dimension, unrolled into plain
    * arithmetic on `element_at`s: the hot expression of training/encoding
    * runs n·ksub times per pass, and the generic HOF form
    * ([[VectorOps.l2Squared]]: zip_with + aggregate) interprets its
    * lambda per row — measured ~6× slower on the assignment join. The
    * unrolled form is ordinary codegen'd arithmetic (dsub is 4–8 in any
    * sane PQ config, so the expression tree stays small). */
  private def l2SqUnrolled(a: Column, b: Column, dim: Int): Column =
    (1 to dim)
      .map { i =>
        val d = element_at(a, i) - element_at(b, i)
        d * d
      }
      .reduce(_ + _)

  /** Nearest-codeword assignment at (id, sub) grain — broadcast the
    * codebooks, pick min L2 (ties → lowest code). Output: (id, sub, code).
    *
    * The argmin is a plain `min` over ONE packed BIGINT —
    * round(d2·1e14)·256 + code, monotone in (d2, code) on a 1e-14
    * distance grid (d2 ≤ 4 for normalized sub-vectors, so the product
    * fits a long with room; codewords within 1e-14 of equal distance tie
    * to the lower code, the same rule min_by would apply) — because a
    * primitive-buffer `min` runs as HashAggregate with map-side combine,
    * while the struct-ordered `min_by` (and any agg carrying the sv
    * array) falls back to SortAggregate and SORTS the n·ksub joined
    * stream on every pass: measured 4.2 s/pass vs sub-second on the
    * fixture, and at 100 TB the difference between a shuffle-free
    * map-side reduction and a corpus·ksub sort. */
  private def bestCodes(rows: DataFrame, cb: DataFrame, p: PqParams): DataFrame =
    rows
      .join(broadcast(cb), "sub")
      .select(
        col("id"),
        col("sub"),
        (round(l2SqUnrolled(col("sv"), col("cw"), p.dsub) * lit(1e14)).cast("long") * 256L +
          col("code")).as("__pk"))
      .groupBy(col("id"), col("sub"))
      .agg(min(col("__pk")).as("__pk"))
      .select(col("id"), col("sub"), (col("__pk") % 256L).cast("int").as("code"))

  /** Train all `m` codebooks jointly: seeds, then `iters` Lloyd steps —
    * each step one broadcast-join assignment + one (sub, code, pos) mean
    * aggregation, ALL subspaces in the same pass. Codewords that attract
    * no sub-vectors drop out (a codebook may shrink below ksub), matching
    * [[SimilarityJoin.lloydRefine]] semantics. Output: (sub, code, cw). */
  def trainCodebooks(emb: DataFrame, idCol: Column, vecCol: Column, p: PqParams): DataFrame = {
    // The sub-row frame is consumed by every Lloyd pass twice (argmin +
    // the sv re-attachment join) — checkpoint it once so training never
    // re-derives the explode from source. At 100 TB a reliable
    // checkpoint/parquet staging dir replaces localCheckpoint, same as
    // the CorpusPrep boundaries.
    val rows = subRows(emb, idCol, vecCol, p).localCheckpoint()
    // Each iteration's output is eagerly checkpointed: the codebook frame
    // is m·ksub rows (KBs), but left lazy it compounds — iteration i
    // would re-execute iterations 1..i−1's corpus passes inside its own
    // broadcast subtree, turning `iters` scans into O(iters²).
    var cb = seedCodebooks(emb, idCol, vecCol, p).localCheckpoint()
    for (_ <- 1 to p.iters)
      // whole-vector recompute (functions/VectorAgg): micro-grid long sums
      // per (sub, code) — no d/m× posexplode + re-group + collect_list
      // reassembly, and the codewords are EXACT integer means under any
      // partitioning (avg(double) summed in shuffle arrival order).
      cb = bestCodes(rows, cb, p)
        .join(rows, Seq("id", "sub")) // re-attach sv: keyed (id, sub) join
        .select(col("sub"), col("code"),
          graft.functions.VectorAgg.quantizeNano(col("sv")).as("q"))
        .groupBy(col("sub"), col("code"))
        .agg(
          graft.functions.VectorAgg.sumLong(col("q")).as("s"),
          count(lit(1)).as("n"))
        .select(col("sub"), col("code"),
          transform(col("s"), x => x.cast("double") / (col("n") * lit(1e9))).as("cw"))
        .localCheckpoint()
    cb
  }

  /** Encode: (id, codes array<int> of length m) — ONE exploded pass +
    * two keyed aggs; the output is the entire serving index payload. */
  def encode(emb: DataFrame, idCol: Column, vecCol: Column, cb: DataFrame, p: PqParams): DataFrame =
    bestCodes(subRows(emb, idCol, vecCol, p), cb, p)
      .groupBy(col("id"))
      .agg(
        transform(array_sort(collect_list(struct(col("sub"), col("code")))), s => s.getField("code"))
          .as("codes"))

  /** Reconstruct the quantized vector from its codes (concatenated
    * codewords) — the x̂ whose exact dot the ADC score equals (law in
    * ProductQuantizerSpec). Vocab-sized broadcast, narrow rebuild. */
  def decode(codes: DataFrame, cb: DataFrame, p: PqParams): DataFrame =
    codes
      .select(col("id"), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(cb), Seq("sub", "code"))
      .groupBy(col("id"))
      .agg(
        flatten(
          transform(array_sort(collect_list(struct(col("sub"), col("cw")))), s => s.getField("cw")))
          .as("vhat"))

  /** ADC top-k: build the per-query m×ksub inner-product table (one
    * broadcast map row), score every code row with a pure Column fold —
    * score = Σ_s table[s·ksub + code_s] — and TakeOrdered the top k.
    * The scan reads ONLY the codes frame: m small ints per vector. */
  def adcTopK(codes: DataFrame, cb: DataFrame, query: DataFrame, k: Int, p: PqParams): DataFrame = {
    val table = cb
      .crossJoin(broadcast(query.select(VectorOps.normalize(VectorOps.asDouble(col("qvec"))).as("q"))))
      .select(
        (col("sub") * p.ksub + col("code")).as("tk"),
        VectorOps.dot(slice(col("q"), col("sub") * p.dsub + 1, lit(p.dsub)), col("cw")).as("tv"))
      .agg(map_from_entries(collect_list(struct(col("tk"), col("tv")))).as("t"))
    codes
      .crossJoin(broadcast(table))
      .select(
        col("id").as("vec_id"),
        round(
          aggregate(
            transform(col("codes"), (c, s) => element_at(col("t"), s * p.ksub + c)),
            lit(0.0),
            (acc, x) => acc + x),
          9).as("cos_adc"))
      .orderBy(col("cos_adc").desc, col("vec_id"))
      .limit(k)
  }

  /** Offline half of the IVFPQ serving pair (the FAISS "IVFx,PQy" layout
    * re-expressed on Spark): coarse-assign every vector to its IVF
    * centroid AND product-quantize it, store ONLY (id, codes) partitioned
    * by cid — the index directory carries `_centroids` (coarse quantizer)
    * and `_codebooks` (PQ codebooks) beside the rows, one self-describing
    * directory like [[SimilarityJoin.buildIvfIndex]]. At 100 TB this is
    * the index you can actually afford to keep hot: partition pruning
    * cuts the scan to ~nprobe/nlist of the corpus and PQ cuts the bytes
    * per scanned row ~32× — the two levers multiply.
    *
    * Build cost: one corpus scan for the coarse assignment, one for the
    * encoding (each a broadcast join + keyed agg), joined on id. Codes
    * quantize the VECTOR, not the residual (see the object Scaladoc), so
    * the codebooks stay valid when centroids are re-Lloyd'd. */
  def buildIvfPqIndex(
      emb: DataFrame,
      idCol: Column,
      vecCol: Column,
      centroids: DataFrame,
      path: String,
      p: PqParams
  ): Unit = {
    val cb = trainCodebooks(emb, idCol, vecCol, p).localCheckpoint()
    SimilarityJoin
      .ivfAssign(emb, idCol, vecCol, centroids)
      .select(col("id"), col("cid"))
      .join(encode(emb, idCol, vecCol, cb, p), "id")
      .write
      .mode("overwrite")
      .partitionBy("cid")
      .parquet(path)
    centroids.write.mode("overwrite").parquet(s"$path/_centroids")
    cb.write.mode("overwrite").parquet(s"$path/_codebooks")
  }

  /** Online half: ADC top-k against a [[buildIvfPqIndex]] directory. The
    * query picks its `nprobe` nearest centroids (the only driver-side
    * value — an nprobe-length id list, config-bounded), the index scan
    * partition-prunes to those cids, and the scored bytes are CODES ONLY.
    * Returns (vec_id, cos_adc). Full-precision re-rank of the shortlist
    * belongs to the caller who owns the raw vector store
    * ([[adcTopKRerank]]); the index alone never stores vectors. */
  def ivfPqProbe(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      query: DataFrame, // single row: (qvec)
      k: Int,
      nprobe: Int
  ): DataFrame = {
    val centroids = spark.read.parquet(s"$indexPath/_centroids")
    val cb        = spark.read.parquet(s"$indexPath/_codebooks")
    val dsub      = cb.select(size(col("cw"))).first().getInt(0)
    val m         = cb.select((max(col("sub")) + 1).cast("int")).first().getInt(0)
    val ksub      = cb.select((max(col("code")) + 1).cast("int")).first().getInt(0)
    val p         = PqParams(dim = m * dsub, m = m, ksub = ksub)
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
      .select(col("id"), col("codes"))
    adcTopK(idx, cb, query, k, p)
  }

  /** The production serving shape: ADC-shortlist `shortlist` candidates
    * from the codes scan, then fetch ONLY those vectors and re-rank by
    * exact cosine. The corpus-sized scan still touches codes only; the
    * full-precision fetch is shortlist-sized (broadcast semi-join), so
    * quality recovers to exact-top-k recall at code-scan cost — the
    * standard IVFPQ + re-rank pattern. Defaults (PqParams + shortlist=5k)
    * recall the entire exact top-10 on the fixture geometry (law in
    * ProductQuantizerSpec). */
  def adcTopKRerank(
      emb: DataFrame,
      idCol: Column,
      vecCol: Column,
      codes: DataFrame,
      cb: DataFrame,
      query: DataFrame,
      k: Int,
      shortlist: Int,
      p: PqParams
  ): DataFrame = {
    val cand = adcTopK(codes, cb, query, shortlist, p).select(col("vec_id"))
    emb
      .select(idCol.cast("long").as("vec_id"), VectorOps.asDouble(vecCol).as("v"))
      .join(broadcast(cand), "vec_id")
      .crossJoin(broadcast(query.select(VectorOps.asDouble(col("qvec")).as("qv"))))
      .select(
        col("vec_id"),
        round(VectorOps.cosineNative(emb.sparkSession, col("v"), col("qv")), 9).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }
}
