package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Deduplication operators for the LLM-data-pipeline surface (SURVEY.md
  * §2.D D1/D2): exact content-hash dedup, MinHash+LSH near-dup, and SimHash
  * near-dup.
  *
  * 100 TB design: every path is a keyed shuffle — no collect, no
  * driver-side state.
  *  - Exact dedup shuffles once on the 256-bit content hash.
  *  - MinHash/LSH shuffles candidates on (band, bucket); bucket sizes are
  *    capped (`maxBucketSize`) so a degenerate bucket (all-identical spam
  *    shards) cannot produce a quadratic pair explosion — oversized buckets
  *    are dropped and surfaced via the `droppedBuckets` side output
  *    pattern. Skewed buckets beyond the cap would be salted in a
  *    production rollout; the cap keeps worst-case bounded either way.
  */
object Dedup {

  /** D1: exact dedup — deterministic keep-lowest-id per sha256(content). */
  def exact(df: DataFrame, contentCol: Column, idCol: Column): DataFrame =
    df.withColumn("content_hash", sha2(contentCol, 256))
      .withColumn("__rn", row_number().over(Window.partitionBy(col("content_hash")).orderBy(idCol)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  final case class MinHashParams(
      numHashes: Int = 32,
      numBands: Int = 8,
      shingleSize: Int = 3,
      jaccardThreshold: Double = 0.5,
      maxBucketSize: Int = 64,
      // One-permutation hashing (TextOps.ophSignature64): O(|shingles|)
      // signature cost instead of O(|shingles| · numHashes) — the knob to
      // flip at 100 TB, where signature hashing dominates the banding
      // pass. Identical signature semantics (mergeable, band-able);
      // slightly noisier per-slot agreement on short docs.
      useOph: Boolean = false
  ) {
    require(numHashes % numBands == 0, "numBands must divide numHashes")
    def rowsPerBand: Int = numHashes / numBands
  }

  /** Banded (doc_id, band, bucket) rows BEFORE the size cap — shared by
    * [[lshBuckets]] (the ≤ cap side feeding candidate pairs) and
    * [[droppedBuckets]] (the > cap audit). */
  private def bandedRows(df: DataFrame, idCol: Column, textCol: Column, p: MinHashParams): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Shingle-hash + signature both in one typed map — Catalyst HOFs
    // interpret their lambdas, so the shingle transform and the 32-way
    // family expansion each run ~5x faster as JVM loops (see TextOps
    // scaladoc; shingleHashesJvm is bit-identical to the Column form).
    df.select(idCol.cast("long").as("doc_id"), textCol.cast("string").as("__text"))
      .as[(Long, String)]
      .filter(_._2 != null) // null text: no signature, no buckets (NPE guard)
      .map { case (id, text) =>
        val shingles = TextOps.shingleHashesJvm(text, p.shingleSize)
        val sig =
          if (p.useOph) TextOps.ophSignature64(shingles, p.numHashes)
          else TextOps.minHashSignature64(shingles, p.numHashes)
        (id, sig)
      }
      .toDF("doc_id", "sig")
      .select(col("doc_id"), TextOps.bandKeys(col("sig"), p.numBands, p.rowsPerBand).as("bands"))
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bucket")))
  }

  /** D2 candidate generation: (band, bucketHash) keyed rows, one per
    * document per band. Bucket-size cap applied. */
  def lshBuckets(df: DataFrame, idCol: Column, textCol: Column, p: MinHashParams): DataFrame = {
    // Cap bucket size: a window count per (band,bucket) — single shuffle,
    // no driver aggregation.
    val wc = Window.partitionBy(col("band"), col("bucket"))
    bandedRows(df, idCol, textCol, p)
      .withColumn("__bucket_n", count(lit(1)).over(wc))
      .filter(col("__bucket_n") <= p.maxBucketSize)
      .drop("__bucket_n")
  }

  /** The SIDE OUTPUT of [[lshBuckets]]' cap: one row per (band, bucket)
    * group that exceeded `maxBucketSize` and therefore contributed no
    * candidate pairs, with its size — the audit a production dedup run
    * ships to its metrics: a handful of huge buckets is the signature of
    * an all-identical spam cluster (investigate the docs) or of
    * mis-tuned banding (re-tune b·r). One map-side-combined agg at
    * (band, bucket) grain; output is at most one row per dropped bucket,
    * never doc-sized. */
  def droppedBuckets(df: DataFrame, idCol: Column, textCol: Column, p: MinHashParams): DataFrame =
    bandedRows(df, idCol, textCol, p)
      .groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > p.maxBucketSize)

  /** D2: near-duplicate pairs — LSH candidates verified by exact Jaccard on
    * the distinct-token sets. Output: (doc_a, doc_b, jaccard), doc_a <
    * doc_b, deterministic. */
  def nearDuplicatePairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      p: MinHashParams = MinHashParams()
  ): DataFrame = {
    val buckets = lshBuckets(df, idCol, textCol, p)
    val l       = buckets.select(col("band").as("band_l"), col("bucket").as("bucket_l"), col("doc_id").as("doc_a"))
    val r       = buckets.select(col("band").as("band_r"), col("bucket").as("bucket_r"), col("doc_id").as("doc_b"))
    val candidates = l
      .join(
        r,
        col("band_l") === col("band_r") && col("bucket_l") === col("bucket_r") &&
          col("doc_a") < col("doc_b")
      )
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    val sets = df.select(idCol.as("id"), TextOps.tokenSet(textCol).as("tokset"))
    candidates
      .join(sets.withColumnRenamed("id", "doc_a").withColumnRenamed("tokset", "set_a"), "doc_a")
      .join(sets.withColumnRenamed("id", "doc_b").withColumnRenamed("tokset", "set_b"), "doc_b")
      .withColumn("jaccard", TextOps.jaccard(col("set_a"), col("set_b")))
      .filter(col("jaccard") >= p.jaccardThreshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 9).as("jaccard"))
  }

  /** D2 (fuzzy decontamination): MinHash/LSH cross-corpus near-dup
    * detection — flags training docs whose content is a NEAR duplicate of
    * any eval doc: the paraphrased/reformatted benchmark leakage that the
    * verbatim k-gram pass ([[exactNgramDecontam]]) cannot see, caught with
    * the same machinery the within-corpus near-dup pass uses.
    *
    * 100 TB design: each side is banded once (signature = JVM hash loop,
    * bit-identical to the Column form); candidates come from an LSH band
    * equi-join BETWEEN the corpora keyed on (band, bucket) — collision
    * work is Σ |bucket_train|·|bucket_eval| per key with both sides
    * capped at `maxBucketSize`, never |train|×|eval| — and are verified
    * by exact token-set Jaccard before flagging. When the eval suite is
    * dimension-sized the banded eval side broadcasts and the join is
    * shuffle-free on the corpus side (Catalyst picks this from stats).
    *
    * Output: one row per CONTAMINATED train doc — (train_id, eval_id,
    * jaccard) of its best-matching eval doc (max jaccard, ties broken by
    * lowest eval_id), jaccard ≥ `p.jaccardThreshold`. */
  def fuzzyDecontamFlags(
      train: DataFrame,
      trainId: Column,
      trainText: Column,
      evalDf: DataFrame,
      evalId: Column,
      evalText: Column,
      p: MinHashParams = MinHashParams()
  ): DataFrame = {
    val l = lshBuckets(train, trainId, trainText, p)
      .select(col("band").as("band_l"), col("bucket").as("bucket_l"), col("doc_id").as("train_id"))
    val r = lshBuckets(evalDf, evalId, evalText, p)
      .select(col("band").as("band_r"), col("bucket").as("bucket_r"), col("doc_id").as("eval_id"))
    val candidates = l
      .join(r, col("band_l") === col("band_r") && col("bucket_l") === col("bucket_r"))
      .select(col("train_id"), col("eval_id"))
      .distinct()
    val trainSets = train.select(trainId.cast("long").as("train_id"), TextOps.tokenSet(trainText).as("set_t"))
    val evalSets  = evalDf.select(evalId.cast("long").as("eval_id"), TextOps.tokenSet(evalText).as("set_e"))
    candidates
      .join(trainSets, "train_id")
      .join(evalSets, "eval_id")
      .withColumn("jaccard", TextOps.jaccard(col("set_t"), col("set_e")))
      .filter(col("jaccard") >= p.jaccardThreshold)
      // Best match per train doc: max jaccard, then LOWEST eval_id — the
      // struct max orders (jaccard, -eval_id) so the tie-break stays
      // deterministic without a window.
      .groupBy(col("train_id"))
      .agg(max(struct(col("jaccard"), (-col("eval_id")).as("neg_eval"))).as("best"))
      .select(
        col("train_id"),
        (-col("best.neg_eval")).cast("long").as("eval_id"),
        round(col("best.jaccard"), 9).as("jaccard"))
  }

  /** D2 (n-gram flavor): exact k-token-shingle Jaccard near-dup pairs,
    * computed scale-safely: pairs come from an equi-join on shared shingles
    * (a pair with Jaccard > 0 shares at least one shingle, so blocking is
    * EXACT — it only prunes zero-overlap pairs), and the overlap |A∩B| is
    * counted FROM the join itself — `groupBy(doc_a, doc_b).count()` over
    * the matched shingle rows — so Jaccard falls out of three exact
    * integers (ov, n_a, n_b) with no per-pair array re-intersection.
    * Never all-pairs: the join is hash-partitioned on the shingle and the
    * overlap count is a partial-aggregating (map-side combine) hash agg,
    * so total work is Σ df(shingle)² join rows — bounded by vocabulary
    * skew, not corpus size. (A PPJoin-style prefix filter was profiled
    * here in round 3: at the thresholds this corpus needs (τ ≤ 0.5) it
    * pruned < 2× but forced a per-pair array-intersect verify that
    * dominated the query ~5:1; counting overlap in the aggregation is
    * both exact and strictly faster. For very high τ on heavy-df corpora
    * the MinHash path is the intended scale answer.)
    *
    * When `threshold` > 0, a size-compatibility filter drops join rows
    * early: Jaccard ≥ τ requires min(n_a,n_b) ≥ τ·max(n_a,n_b) (since
    * |A∩B| ≤ min and |A∪B| ≥ max) — an exact prune, made FP-safe with a
    * 1e-9 slack so double rounding can never drop a qualifying pair. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      shingleSize: Int,
      threshold: Double
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Shingling runs as a JVM loop (TextOps.distinctShingleHashesJvm):
    // Catalyst HOF lambdas are interpreted — profiled ~2.8 s/evaluation at
    // sf0.1 vs milliseconds here. Hashed (not string) shingles: the join
    // below only COUNTS matches, so the 8-byte xxhash64 key halves shuffle
    // bytes vs k-token strings (collision odds ≈ n²/2⁶⁵ — see TextOps).
    val base = df
      .select(idCol.cast("long").as("doc_id"), textCol.cast("string").as("__text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, TextOps.distinctShingleHashesJvm(text, shingleSize)) }
      .filter(_._2 != null) // null text or fewer than k tokens: no pairs
      .toDF("doc_id", "sh")
    val exploded = base.select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
    val l        = exploded.select(col("s"), col("doc_id").as("doc_a"), col("n").as("n_a"))
    val r        = exploded.select(col("s").as("s_r"), col("doc_id").as("doc_b"), col("n").as("n_b"))
    val sizeCompat =
      if (threshold > 0)
        least(col("n_a"), col("n_b")).cast("double") >=
          lit(threshold) * greatest(col("n_a"), col("n_b")).cast("double") - lit(1e-9)
      else lit(true)
    // shuffle_hash: both sides are one narrow pass over the corpus — a
    // hash join skips the per-partition sort of the (string-keyed) rows
    // that SMJ would pay; at 100 TB the shingle key space is huge so
    // per-partition hash tables stay small.
    l.hint("shuffle_hash")
      .join(r, col("s") === col("s_r") && col("doc_a") < col("doc_b") && sizeCompat)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("ov"), first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      .select(
        col("doc_a"),
        col("doc_b"),
        round(
          col("ov").cast("double") / (col("n_a") + col("n_b") - col("ov")).cast("double"),
          9).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** D2 (asymmetric overlap): shingle CONTAINMENT pairs — c(A→B) =
    * |A∩B|/|A|, the doc-inside-doc detector. Symmetric Jaccard misses the
    * quote/excerpt/wrapper case by construction (a 50-shingle doc fully
    * contained in a 5000-shingle doc has jac ≤ 0.01 but containment 1.0);
    * decontamination and license-compliance sweeps care about exactly
    * that asymmetry. Same de-quadratic shared-shingle candidate join as
    * [[ngramJaccardPairs]], but NO size-compatibility prune — incomparable
    * sizes are the point. Emits one row per unordered pair with BOTH
    * directions (`cont_a` = into-A coverage, `cont_b` = into-B), kept when
    * either direction clears the threshold. */
  def containmentPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      shingleSize: Int,
      threshold: Double
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df
      .select(idCol.cast("long").as("doc_id"), textCol.cast("string").as("__text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, TextOps.distinctShingleHashesJvm(text, shingleSize)) }
      .filter(_._2 != null)
      .toDF("doc_id", "sh")
    val exploded = base.select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
    val l        = exploded.select(col("s"), col("doc_id").as("doc_a"), col("n").as("n_a"))
    val r        = exploded.select(col("s").as("s_r"), col("doc_id").as("doc_b"), col("n").as("n_b"))
    l.hint("shuffle_hash")
      .join(r, col("s") === col("s_r") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("ov"), first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      .filter(
        greatest(
          col("ov").cast("double") / col("n_a").cast("double"),
          col("ov").cast("double") / col("n_b").cast("double")) >= threshold)
      .select(
        col("doc_a"), col("doc_b"),
        round(col("ov").cast("double") / col("n_a").cast("double"), 9).as("cont_a"),
        round(col("ov").cast("double") / col("n_b").cast("double"), 9).as("cont_b"))
  }

  /** D2 (contamination flavor): exact k-token-shingle Jaccard pairs ACROSS
    * two corpora — the train/eval overlap check every LLM data pipeline
    * runs before training (was the eval set crawled into the training
    * corpus?). Same de-quadratic shape as [[ngramJaccardPairs]]: candidates
    * come from a shared-shingle equi-join BETWEEN the two sides (exact —
    * only zero-overlap pairs are pruned), the overlap |A∩B| is counted in
    * the aggregation, and the size-compatibility prune (FP-safe slack)
    * drops hopeless rows before the shuffle. Work is Σ df_left(s)·df_right(s)
    * join rows — never |train|×|eval|. Output: (train_id, eval_id, jac),
    * jac ≥ threshold. */
  def crossNgramJaccardPairs(
      train: DataFrame,
      trainId: Column,
      trainText: Column,
      evalDf: DataFrame,
      evalId: Column,
      evalText: Column,
      shingleSize: Int,
      threshold: Double
  ): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    def shingled(df: DataFrame, id: Column, text: Column, idAs: String, nAs: String, sAs: String) =
      df.select(id.cast("long").as("doc_id"), text.cast("string").as("__text"))
        .as[(Long, String)]
        .map { case (i, t) => (i, TextOps.distinctShingleHashesJvm(t, shingleSize)) }
        .filter(_._2 != null) // null text or fewer than k tokens: no pairs
        .toDF("doc_id", "sh")
        .select(col("doc_id").as(idAs), size(col("sh")).as(nAs), explode(col("sh")).as(sAs))
    val l = shingled(train, trainId, trainText, "train_id", "n_t", "s")
    val r = shingled(evalDf, evalId, evalText, "eval_id", "n_e", "s_r")
    val sizeCompat =
      if (threshold > 0)
        least(col("n_t"), col("n_e")).cast("double") >=
          lit(threshold) * greatest(col("n_t"), col("n_e")).cast("double") - lit(1e-9)
      else lit(true)
    l.hint("shuffle_hash")
      .join(r, col("s") === col("s_r") && sizeCompat)
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("ov"), first(col("n_t")).as("n_t"), first(col("n_e")).as("n_e"))
      .select(
        col("train_id"),
        col("eval_id"),
        round(
          col("ov").cast("double") / (col("n_t") + col("n_e") - col("ov")).cast("double"),
          9).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** D2 (decontamination flavor): EXACT k-token-shingle hit counting
    * against an eval set — the GPT-3/PaLM-style "remove any training
    * document sharing a verbatim 13-gram with an eval benchmark" pass,
    * the strict complement of [[crossNgramJaccardPairs]]'s fuzzy-overlap
    * check. A train doc is flagged with the NUMBER of its distinct
    * k-shingles that occur anywhere in the eval corpus (which eval doc is
    * irrelevant — any hit disqualifies), so downstream can threshold on
    * absolute hits or on the contaminated fraction.
    *
    * 100 TB design: the eval side is a benchmark suite — dimension-sized
    * relative to the corpus — so its distinct-shingle universe is
    * broadcast and the whole pass is ONE corpus scan with a broadcast
    * semi-structure: no corpus-sized shuffle at all. Documents shorter
    * than k tokens have no k-grams and are exact-match territory
    * (D1/[[crossNgramJaccardPairs]]), not n-gram territory — both sides
    * drop them. Both sides shingle via the profiled JVM hash loop
    * ([[TextOps.distinctShingleHashesJvm]], same path as
    * [[crossNgramJaccardPairs]]) and join on the 64-bit shingle hash —
    * strings never shuffle or broadcast, and the counts are unchanged up
    * to 64-bit collisions (≪1e-8 even at 10⁹ distinct shingles, the same
    * accepted risk as the contamination check). */
  def exactNgramDecontam(
      train: DataFrame,
      trainId: Column,
      trainText: Column,
      evalDf: DataFrame,
      evalId: Column,
      evalText: Column,
      shingleSize: Int
  ): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    def shingled(df: DataFrame, id: Column, text: Column) =
      df.select(id.cast("long").as("doc_id"), text.cast("string").as("__text"))
        .as[(Long, String)]
        .map { case (i, t) => (i, TextOps.distinctShingleHashesJvm(t, shingleSize)) }
        .filter(_._2 != null) // null text or fewer than k tokens: no k-grams
        .toDF("doc_id", "sh")
    val evalShingles = shingled(evalDf, evalId, evalText)
      .select(explode(col("sh")).as("s_e"))
      .distinct()
    shingled(train, trainId, trainText)
      .select(
        col("doc_id").as("train_id"),
        size(col("sh")).cast("long").as("n_sh"),
        explode(col("sh")).as("s"))
      .join(broadcast(evalShingles), col("s") === col("s_e"))
      .groupBy(col("train_id"), col("n_sh"))
      .agg(count(lit(1)).as("n_hits")) // sh is distinct per doc → count = distinct hits
      .select(
        col("train_id"),
        col("n_sh"),
        col("n_hits"),
        round(col("n_hits").cast("double") / col("n_sh").cast("double"), 9)
          .as("contaminated_frac"))
  }

  /** Connected components over an undirected edge list — the step that
    * turns near-duplicate PAIRS into dedup CLUSTERS (pick one canonical doc
    * per component). Alternating large-star / small-star (the exact-CC
    * MapReduce algorithm of Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14): each round rewires every edge toward
    * the minimum of a node's neighborhood, converging to one star per
    * component rooted at the component minimum in O(log n) rounds — not
    * O(diameter) like plain min-label propagation, so long chains
    * (incremental near-dup edit histories) are safe at scale.
    *
    * 100 TB design: a round is two windowed min-aggregations plus a
    * distinct — all keyed shuffles; the only driver-side values are the
    * scalar convergence counts. Each round is materialized with
    * `localCheckpoint` to keep the plan O(1) deep, and the superseded
    * round's blocks are unpersisted immediately, so peak storage is two
    * rounds' edge sets regardless of round count. The returned DataFrame is
    * backed by the node-universe and final-round checkpoints; those blocks
    * are freed by Spark's ContextCleaner once the caller drops the
    * reference. On a
    * multi-executor cluster prefer a reliable checkpoint dir —
    * `localCheckpoint` trades executor-loss tolerance for speed, which is
    * acceptable only because a lost block fails the job loudly rather than
    * corrupting the answer.
    *
    * Throws IllegalStateException when `maxIter` rounds pass without
    * convergence: a silently partial cluster map would be a WRONG answer
    * (the failure mode min-label propagation had here before round 4).
    *
    * Output: (node, cluster) where cluster = min node id in the component,
    * one row per distinct node in `edges`. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    import org.apache.spark.sql.execution.LogicalRDD

    // localCheckpoint + handle to its backing cached RDD, so a superseded
    // round can be freed deterministically (Dataset.unpersist only covers
    // CacheManager entries, not checkpoint blocks).
    def checkpointed(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[_]) = {
      val cp = df.localCheckpoint(eager = true)
      val rdd = cp.queryExecution.analyzed
        .collectFirst { case l: LogicalRDD => l.rdd }
        .getOrElse(throw new IllegalStateException("localCheckpoint did not yield a LogicalRDD plan"))
      (cp, rdd)
    }

    // Materialize the input ONCE — `edges` is typically the tail of an
    // expensive pair-generation pipeline, and both the node universe and
    // the canonical edge set derive from it (evaluating it twice doubled
    // the query cost when nodes was left as a lazy plan).
    val (base, baseRdd) = checkpointed(edges.toDF("src", "dst"))

    // Node universe (self-loops contribute a node but no edge).
    val (nodes, nodesRdd) = checkpointed(
      base.select(col("src").as("node")).union(base.select(col("dst").as("node"))).distinct())

    // Canonical undirected form: (hi, lo) with hi > lo, distinct.
    var (cur, curRdd) = checkpointed(
      base
        .filter(col("src") =!= col("dst"))
        .select(greatest(col("src"), col("dst")).as("hi"), least(col("src"), col("dst")).as("lo"))
        .distinct())
    baseRdd.unpersist(blocking = false) // nodes + cur supersede the raw input

    val wCtr     = Window.partitionBy(col("ctr"))
    val wHi      = Window.partitionBy(col("hi"))
    var curCount = curRdd.count() // cached-block count, no SQL re-plan
    var converged = curCount == 0L
    var i         = 0
    while (!converged && i < maxIter) {
      // Large-star: around every node ctr, link each LARGER neighbor to the
      // minimum of the neighborhood (incl. ctr). Output stays canonical:
      // nbr > ctr >= m. Duplicate rows are fine — the windowed min below is
      // duplicate-insensitive and the round's final distinct dedups — so no
      // extra shuffle here.
      val sym = cur
        .select(col("hi").as("ctr"), col("lo").as("nbr"))
        .union(cur.select(col("lo").as("ctr"), col("hi").as("nbr")))
      val ls = sym
        .withColumn("m", least(col("ctr"), min(col("nbr")).over(wCtr)))
        .filter(col("nbr") > col("ctr"))
        .select(col("nbr").as("hi"), col("m").as("lo"))
      // Small-star: around every node hi, link its smaller neighbors (and
      // hi itself) to their minimum m; (lo, m) rows drop when lo = m.
      val withMin = ls.withColumn("m", min(col("lo")).over(wHi))
      val (next, nextRdd) = checkpointed(
        withMin
          .filter(col("lo") =!= col("m"))
          .select(col("lo").as("hi"), col("m").as("lo"))
          .union(withMin.select(col("hi"), col("m").as("lo")))
          .distinct())
      // Both sides are distinct canonical sets: equal counts + empty
      // one-sided difference ⇔ the round was a no-op ⇔ stars reached.
      // (&& short-circuits: rounds that changed the edge count skip the
      // except job entirely.)
      val nextCount = nextRdd.count()
      converged = nextCount == curCount && next.except(cur).isEmpty
      curRdd.unpersist(blocking = false) // superseded round: free its blocks
      cur = next
      curRdd = nextRdd
      curCount = nextCount
      i += 1
    }
    if (!converged) {
      curRdd.unpersist(blocking = false)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter large-star/small-star rounds — " +
          "refusing to return a partial (wrong) cluster map")
    }
    nodes
      .join(cur.select(col("hi").as("node"), col("lo").as("root")), Seq("node"), "left")
      .select(col("node"), coalesce(col("root"), col("node")).as("cluster"))
  }

  /** D2 (line granularity): boilerplate-line removal — the CCNet/
    * RefinedWeb-style dedup step BELOW document level: a line (or any
    * `delimiter`-separated unit) appearing in at least `minDocFrequency`
    * DISTINCT documents is boilerplate (headers, navigation, cookie
    * banners, license blurbs) and is removed from every document; the
    * surviving units are rejoined in their original order.
    *
    * 100 TB design: one posexplode (narrow), one (unit → distinct-doc
    * count) hash aggregation, one equi-join back on the unit, and one
    * per-doc ordered reassembly — all keyed shuffles; unit order rides a
    * captured position index, so reassembly is partitioning-independent.
    * Output: one row per input doc (docs whose every unit was boilerplate
    * keep an empty clean_text rather than vanishing).
    */
  def removeBoilerplateLines(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      delimiter: String,
      minDocFrequency: Long
  ): DataFrame = {
    val base = df.select(idCol.cast("long").as("doc_id"), textCol.cast("string").as("__text"))
    val units = base
      .select(
        col("doc_id"),
        posexplode(split(col("__text"), java.util.regex.Pattern.quote(delimiter)))
          .as(Seq("pos", "unit")))
      .filter(length(col("unit")) > 0)
    val freq = units.groupBy(col("unit")).agg(countDistinct(col("doc_id")).as("unit_df"))
    val kept = units
      .join(freq, "unit")
      .filter(col("unit_df") < minDocFrequency)
      .groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("unit")))),
            s => s.getField("unit")),
          delimiter).as("clean_text"),
        count(lit(1)).as("kept_units"))
    base
      .join(kept, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("kept_units"), lit(0L)).as("kept_units"))
  }

  /** D2 (SimHash flavor): near-dup pairs within a Hamming radius, with
    * candidate generation blocked across `rotations` bit-rotations of the
    * simhash: a pair within radius r differs in ≤ r bits, so among
    * `rotations` evenly-spaced rotations at least one places all differing
    * bits outside the top `blockBits` with high probability — the
    * standard recall fix for single-prefix blocking. Union of per-rotation
    * candidates, deduped, then exact Hamming verify. Each rotation is one
    * shuffle key; total work stays Σ block² per rotation. */
  def simHashPairsRotated(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      maxHamming: Int = 8,
      blockBits: Int = 16,
      rotations: Int = 4
  ): DataFrame = {
    require(rotations > 0 && 64 % rotations == 0, "rotations must divide 64")
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df
      .select(idCol.cast("long").as("id"), textCol.cast("string").as("__text"))
      .as[(Long, String)]
      .filter(_._2 != null) // null text: no simhash, no pairs (NPE guard)
      .map { case (id, text) => (id, TextOps.simHash64(TextOps.tokenHashesJvm(text))) }
      .toDF("id", "sh")
    val step = 64 / rotations
    def rotl(c: Column, k: Int): Column =
      if (k == 0) c else shiftleft(c, k).bitwiseOR(shiftrightunsigned(c, 64 - k))
    val blocks = array(
      (0 until rotations).map(r => shiftrightunsigned(rotl(col("sh"), r * step), 64 - blockBits)): _*
    )
    val keyed = hashed.select(col("id"), col("sh"), posexplode(blocks).as(Seq("rot", "blk")))
    val l = keyed.select(col("rot").as("rot_l"), col("blk").as("blk_l"), col("id").as("doc_a"), col("sh").as("sh_a"))
    val r = keyed.select(col("rot").as("rot_r"), col("blk").as("blk_r"), col("id").as("doc_b"), col("sh").as("sh_b"))
    l.join(
        r,
        col("rot_l") === col("rot_r") && col("blk_l") === col("blk_r") && col("doc_a") < col("doc_b")
      )
      .select(col("doc_a"), col("doc_b"), TextOps.hamming64(col("sh_a"), col("sh_b")).as("hamming"))
      .distinct() // a pair can surface from several rotations
      .filter(col("hamming") <= maxHamming)
  }

  /** D2 (SimHash flavor): 64-bit simhash per doc + near-dup pairs within a
    * Hamming radius, blocked on the top `blockBits` bits to avoid an
    * all-pairs join (near-dups share high bits with high probability; see
    * [[simHashPairsRotated]] for the multi-rotation recall fix).
    *
    * Default radius 8/64 is the usual web-dedup operating point; the
    * registered `d2_simhash` query deliberately overrides to 10 because
    * the shared-vocabulary synthetic corpus compresses Hamming distances
    * (rationale at the query, LlmQueries "d2_simhash") — that override is
    * a FIXTURE calibration, not a second default. */
  def simHashPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      maxHamming: Int = 8,
      blockBits: Int = 20
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df
      .select(idCol.cast("long").as("id"), textCol.cast("string").as("__text"))
      .as[(Long, String)]
      .filter(_._2 != null) // null text: no simhash, no pairs (NPE guard)
      .map { case (id, text) => (id, TextOps.simHash64(TextOps.tokenHashesJvm(text))) }
      .toDF("id", "sh")
    val blocked = hashed.withColumn("blk", shiftrightunsigned(col("sh"), 64 - blockBits))
    val l = blocked.select(col("blk").as("blk_l"), col("id").as("doc_a"), col("sh").as("sh_a"))
    val r = blocked.select(col("blk").as("blk_r"), col("id").as("doc_b"), col("sh").as("sh_b"))
    l.join(r, col("blk_l") === col("blk_r") && col("doc_a") < col("doc_b"))
      .withColumn("hamming", TextOps.hamming64(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** D2 (span granularity): exact duplicated-SPAN removal — the
    * "ExactSubstr" dedup of Lee et al. 2021 ("Deduplicating Training Data
    * Makes Language Models Better", arXiv:2107.06499) re-expressed as
    * keyed shuffles instead of a monolithic suffix array. Any k-token
    * window whose text occurs more than once in the corpus is cut from
    * every occurrence EXCEPT the canonical first one (lowest
    * (doc_id, pos)); overlapping flagged windows merge into maximal
    * spans; each document is rebuilt (whitespace/case-normalized) from
    * its surviving tokens. The doc-level D1/D2 passes keep one copy of a
    * duplicated DOCUMENT — this removes duplicated PASSAGES (licence
    * blocks, boilerplate paragraphs, quoted headers) hiding inside
    * otherwise-unique documents, which doc-grain dedup cannot see.
    *
    * 100 TB design: total work is Σ tokens — ONE corpus-token-sized
    * exchange on the gram key (count + canonical occurrence as
    * whole-partition window aggregates — no groupBy-and-join-back, which
    * would consume the tokenize+window subtree twice), one doc-grain
    * aggregation over FLAGGED windows only; no all-pairs stage anywhere.
    * The key shuffled is the 64-bit xxhash of the window text (strings
    * never shuffle; collisions ≪1e-8 at 1e9 distinct windows — same
    * accepted risk as the other n-gram passes). The span merge is a
    * sorted per-doc fold and the rebuild is narrow lambda algebra — both
    * codegen'd, no UDFs.
    *
    * Skew note: all occurrences of one gram co-locate on its reducer, so
    * a mega-boilerplate k-gram repeated across millions of docs would
    * make a hot partition. Unlike the LSH bucket cap, occurrences cannot
    * be DROPPED here (skipping a hot gram means shipping mega-duplicated
    * boilerplate — the exact content this pass exists to cut), so the
    * mitigation at that scale is the salted two-phase aggregate (per
    * (gram, salt) partials → gram totals → join back to a checkpointed
    * window frame), paying a materialization to keep the hot key off one
    * reducer. At production k (Lee et al. use ~50 tokens) multiplicities
    * after doc-grain dedup stay far below that regime, so the one-scan
    * window form is the right default.
    *
    * Output: (doc_id, clean_text, n_kept, n_removed) for EVERY input doc
    * — untouched and sub-k-token docs pass through with n_removed = 0.
    */
  def duplicateSpanRemoval(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      k: Int
  ): DataFrame = {
    require(k >= 2, s"span shingle size must be >= 2, got $k")
    val emptySpans = slice(array(struct(lit(0).as("s"), lit(0).as("e"))), 1, 0)
    // r21 (guide §2.5): window generation (per-window slice+hash) and the
    // rebuild's lambda algebra are CPU-bound narrow maps over this frame;
    // a 1-partition input (single-row-group fixture, or an AQE-coalesced
    // upstream) serializes them on one core. Adaptive: no-op when the
    // input is already split.
    val toks = graft.tables.Tables.rebalanceForCpuBy(
      df.select(
        idCol.cast("long").as("doc_id"),
        TextOps.tokens(textCol).as("toks")),
      col("doc_id"))
    // Every k-token window: (doc_id, pos, gram-hash). Docs shorter than k
    // tokens have no windows and flow straight to the rebuild join.
    val wins = toks
      .filter(size(col("toks")) >= k)
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(lit(0), size(col("toks")) - k),
            p =>
              struct(
                p.as("pos"),
                xxhash64(concat_ws(" ", slice(col("toks"), p + 1, lit(k)))).as("g"))))
          .as("w"))
      .select(col("doc_id"), col("w.pos").as("pos"), col("w.g").as("g"))
    // Non-canonical occurrences of repeated grams = the windows to cut.
    // ONE exchange on the gram key: occurrence count and canonical
    // occurrence are whole-partition window aggregates over g, so the
    // window frame never re-derives or re-shuffles `wins` — the
    // groupBy-then-join-back form would consume the tokenize+window
    // subtree twice (two corpus scans) and shuffle it twice.
    val wg = Window.partitionBy(col("g"))
    val flagged = wins
      .withColumn("__cnt", count(lit(1)).over(wg))
      .withColumn("__canon", min(struct(col("doc_id"), col("pos"))).over(wg))
      .filter(
        col("__cnt") > 1 &&
          !(col("doc_id") === col("__canon.doc_id") && col("pos") === col("__canon.pos")))
      .select(col("doc_id"), col("pos"))
    // Merge each doc's flagged [pos, pos+k-1] windows into maximal spans:
    // a sorted fold over that doc's flagged windows only. Windows all have
    // length k, so the running last.e is the max end seen in the island
    // and `pos <= last.e + 1` is the exact adjacency-or-overlap test.
    val spans = flagged
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
      .select(
        col("doc_id"),
        aggregate(
          col("ps"),
          emptySpans,
          (acc, p) =>
            when(
              size(acc) > 0 && p <= element_at(acc, -1).getField("e") + 1,
              concat(
                slice(acc, lit(1), size(acc) - 1),
                array(struct(
                  element_at(acc, -1).getField("s").as("s"),
                  greatest(element_at(acc, -1).getField("e"), p + k - 1).as("e")))))
              .otherwise(concat(acc, array(struct(p.as("s"), (p + k - 1).as("e")))))
        ).as("iv"))
    // Rebuild every document from its surviving token positions.
    toks
      .join(spans, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("toks"), expr("array()").cast("array<string>")).as("toks"),
        coalesce(col("iv"), emptySpans).as("iv"))
      .select(
        col("doc_id"),
        filter(
          transform(col("toks"), (t, i) => struct(t.as("t"), i.as("p"))),
          s =>
            !exists(
              col("iv"),
              v => s.getField("p") >= v.getField("s") && s.getField("p") <= v.getField("e"))
        ).as("kept"),
        size(col("toks")).as("n_toks"))
      .select(
        col("doc_id"),
        array_join(transform(col("kept"), s => s.getField("t")), " ").as("clean_text"),
        size(col("kept")).cast("long").as("n_kept"),
        (col("n_toks") - size(col("kept"))).cast("long").as("n_removed"))
  }

  /** Content-defined chunking (the FastCDC/rsync family, on tokens): cut
    * a document into variable-size chunks at positions where a k-token
    * rolling window hashes to a boundary value. Because boundaries depend
    * only on LOCAL content, an insertion early in a document shifts at
    * most one chunk — unlike fixed-size blocks, where one inserted token
    * re-keys every downstream block. That makes chunk-hash dedup the
    * storage-level dedup: near-identical documents (crawl re-fetches,
    * template families) share most chunk hashes even when exact-doc and
    * even span-level dedup miss them.
    *
    * Determinism/oracle contract: the boundary predicate is
    * `substr(md5(window), 1, hexZeros) = '0'*hexZeros` — pure string ops
    * both engines evaluate identically (no float, no seed). Expected
    * chunk length ≈ 16^hexZeros tokens. Plan shape: one explode + ONE
    * per-doc window prefix-sum (boundary flags → chunk ids) + one
    * (doc, chunk) agg — a single keyed shuffle on doc_id, then one on
    * (doc, chunk); no pairwise anything, corpus-linear at any scale.
    *
    * Returns (doc_id, chunk_idx, n_tok, chunk_hash). Every doc with ≥1
    * token emits ≥1 chunk; chunk_idx is dense from 0 in token order. */
  def cdcChunks(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      windowTokens: Int = 4,
      hexZeros: Int = 1
  ): DataFrame = {
    require(windowTokens >= 1 && hexZeros >= 1 && hexZeros <= 8)
    val zeros = "0" * hexZeros
    val ex = docs
      .select(idCol.cast("long").as("doc_id"), TextOps.tokens(textCol).as("tk"))
      .select(col("doc_id"), col("tk"), posexplode(col("tk")).as(Seq("p", "tok")))
    // boundary AFTER position p when the k-window ending at p hits the
    // boundary pattern; chunk id = count of boundaries strictly before p.
    val isBoundary = (col("p") >= windowTokens - 1) &&
      (substring(md5(concat_ws(" ", slice(col("tk"), col("p") - (windowTokens - 2), lit(windowTokens)))), 1, hexZeros)
        === zeros)
    val w = Window
      .partitionBy(col("doc_id"))
      .orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ex
      .withColumn("b", isBoundary.cast("long"))
      .withColumn("chunk_idx", coalesce(sum(col("b")).over(w), lit(0L)))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(
        count(lit(1)).cast("long").as("n_tok"),
        md5(array_join(
          transform(sort_array(collect_list(struct(col("p"), col("tok")))), s => s.getField("tok")),
          " ")).as("chunk_hash"))
  }

  /** Distinct k-token shingle FINGERPRINTS per document — (doc_id, h)
    * with h a 64-bit FNV-1a over the space-joined shingle — as ONE
    * mapPartitions JVM pass (tokenize → slide → hash → per-doc dedup in
    * a hash set), the profiled twin of the declarative
    * split/transform/concat_ws/explode pipeline. The HOF chain is not
    * codegen'd (higher-order lambdas evaluate interpreted) and
    * materializes every shingle STRING before hashing; at sf0.1 that
    * measured 6.0 s of a 7.7 s query, where this loop does the same
    * work in under a second. Tokenization mirrors [[graft.functions
    * .TextOps.tokens]] bit-for-bit (lowercase, split on single space,
    * drop empties — a DedupSpec law pins the equivalence), so
    * downstream counts match the string-shingle oracle exactly, modulo
    * 64-bit collisions (~n²/2⁶⁵, the repo's accepted n-gram risk).
    * Docs with fewer than k tokens emit nothing — restore them with a
    * left join from the doc table, as every consumer of the exploded
    * shingle stream already does.
    *
    * Sibling of [[graft.functions.TextOps.shingleHashesJvm]] /
    * `distinctShingleHashesJvm` (the MinHash path's xxhash64-EXACT
    * twins, which must bit-match the Column `xxhash64` form and keep the
    * whole-document shingle for short docs): this one owns the
    * memorization-risk contract instead — per-doc DISTINCT, k-token
    * minimum (short docs vanish), and a free hash choice (FNV-1a inlined
    * over chars — no per-shingle string allocation at all, where the
    * xxhash twins must materialize each shingle string to hash it). */
  def shingleHashes(df: DataFrame, idCol: Column, textCol: Column, k: Int): DataFrame = {
    require(k >= 1, s"shingle size must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    df // allocation-free FNV fingerprinting outruns the rebalance shuffle —
      // measured faster single-task on the fixture than repartitioned
      .select(idCol.cast("long"), textCol.cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, textOrNull) =>
          val text = if (textOrNull == null) "" else textOrNull
          // UTF8String.toLowerCase IS Spark's lower() — routing through it
          // (not String.toLowerCase, which is default-locale-sensitive)
          // keeps tokenization bit-equal to TextOps.tokens under any JVM
          // locale, the same discipline as TextOps.shingleHashesJvm
          val ts = org.apache.spark.unsafe.types.UTF8String
            .fromString(text).toLowerCase.toString
            .split(" ").filter(_.nonEmpty)
          if (ts.length < k) Iterator.empty
          else {
            val seen = new java.util.HashSet[java.lang.Long]()
            val out  = Array.newBuilder[(Long, Long)]
            var i = 0
            while (i + k <= ts.length) {
              // FNV-1a over the chars of the space-joined k-gram, space
              // included after every token — same identity as
              // concat_ws(" ", slice(toks, i, k)) without building it
              var h = -3750763034362895579L // FNV-64 offset basis
              var j = i
              while (j < i + k) {
                val w  = ts(j)
                var c  = 0
                while (c < w.length) { h ^= w.charAt(c).toLong; h *= 1099511628211L; c += 1 }
                h ^= ' '.toLong; h *= 1099511628211L
                j += 1
              }
              if (seen.add(h)) out += ((id, h))
              i += 1
            }
            out.result().iterator
          }
        }
      }
      .toDF("doc_id", "h")
  }
}
