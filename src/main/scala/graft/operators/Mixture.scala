package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix construction (SURVEY §2.D extension): build a corpus
  * mixture by sampling each slice (source/language/domain) down to a
  * TOKEN budget — the operation that turns "all of the crawl" into "the
  * 60/30/10 web/books/code mix with N billion tokens per slice" that an
  * LLM pretraining run actually consumes.
  *
  * 100 TB design: one window (hash-partitioned sort within each slice) —
  * no collect, no per-slice driver loop; slices process independently, so
  * skew is bounded by the largest slice, and the deterministic hash order
  * makes the sample reproducible run-over-run and engine-independent
  * (the order key is plain modular arithmetic, expressible in ANSI SQL —
  * deliberately NOT xxhash64, so the oracle can replay it). */
object Mixture {

  /** Deterministic pseudo-shuffle key: Knuth multiplicative hashing on the
    * id, kept inside BIGINT range on any engine (id is first reduced mod a
    * prime so id * 2654435761 cannot overflow ANSI BIGINT). */
  def shuffleKey(idCol: Column): Column =
    pmod(pmod(idCol.cast("long"), lit(1000000007L)) * lit(2654435761L), lit(4294967296L))

  /** Bucket a [[shuffleKey]] into [0, n) via its HIGH bits:
    * floor(key·n / 2³²). A multiplicative hash's low bits barely mix
    * (2654435761 ≡ 1 mod 4, so `key % 4` ≡ `id % 4` — structured ids
    * collapse onto a few buckets); the high bits carry the avalanche
    * (Knuth, TAOCP §6.4). Long arithmetic only — key < 2³² and
    * n ≤ 2³¹ keep key·n < 2⁶³ non-negative, so `>> 32` IS the floor
    * division by 2³² (Column `/` would go through double and lose
    * precision above 2⁵³; ANSI engines write it `(key * n) // 4294967296`). */
  def shuffleBucket(key: Column, n: Int): Column =
    shiftright(key * lit(n.toLong), 32)

  /** EXCLUSIVE running total of `valueCol` in (key, id) order within
    * `partColName` — the primitive under every "prefix in shuffle order"
    * operator here (running token budgets, pack assignment, shuffle/
    * curriculum positions = prefix count + 1) — computed HIERARCHICALLY
    * so no partition value ever becomes a single-reducer sort:
    *
    *  1. rows sub-shard on [[shuffleBucket]](key, subShards) — MONOTONE
    *     in key (floor(key·S/2³²) never decreases as key grows), so
    *     (sub-shard, key, id) order IS (key, id) order;
    *  2. one window per (partition, sub-shard) computes the local
    *     inclusive prefix — per-task sort shrinks subShards-fold;
    *  3. a dimension-sized offset table (≤ partitions × subShards rows:
    *     per-group totals + a running total over each partition's few
    *     sub-shard rows) lifts local prefixes to partition-global ones.
    *
    * The composed prefix equals the single-window prefix row for row
    * (MixtureSpec pins it for every caller at several subShards values,
    * and the oracle-checked d7 queries hash-match through it). Cost: one
    * extra scan of the input subtree for the offset counts — cache or
    * checkpoint upstream when it is expensive.
    *
    * `df` must already carry `partColName` and `keyColName` as real
    * columns (renamed internals stay unambiguous through the self-join). */
  private def withPrefixBefore(
      df: DataFrame,
      partColName: String,
      keyColName: String,
      idCol: Column,
      valueCol: Column,
      outName: String,
      subShards: Int
  ): DataFrame = {
    require(subShards > 0 && subShards <= (1 << 20), "subShards must be in [1, 2^20]")
    val base = df.withColumn("__pss", shuffleBucket(col(keyColName), subShards))
    val wLocal = Window
      .partitionBy(col(partColName), col("__pss"))
      .orderBy(col(keyColName), idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window
      .partitionBy(col("__opart"))
      .orderBy(col("__oss"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base
      .groupBy(col(partColName).as("__opart"), col("__pss").as("__oss"))
      .agg(sum(valueCol).as("__on"))
      .withColumn("__ooff", coalesce(sum(col("__on")).over(wOff), lit(0L)))
      .select(col("__opart"), col("__oss"), col("__ooff"))
    base
      .withColumn("__pincl", sum(valueCol).over(wLocal))
      .join( // null-safe: a null partition/key still rides its own group,
        //      exactly as the plain window treated it
        broadcast(offsets),
        col(partColName) <=> col("__opart") && col("__pss") <=> col("__oss"))
      .withColumn(outName, col("__ooff") + col("__pincl") - valueCol)
      .drop("__pss", "__pincl", "__opart", "__oss", "__ooff")
  }

  /** Keep, per value of `sliceCol`, the minimal deterministic prefix of
    * docs (in [[shuffleKey]] order) whose token counts COVER
    * `tokenBudget`: a doc survives iff the running total BEFORE it is
    * still under budget — so every slice with enough material ends at or
    * above budget, overshooting by less than one document; slices with
    * less material than the budget are kept whole. */
  def sampleToTokenBudget(
      docs: DataFrame,
      idCol: Column,
      sliceCol: Column,
      tokenCountCol: Column,
      tokenBudget: Long,
      subShards: Int = 256
  ): DataFrame =
    withPrefixBefore(
      docs.withColumn("__slc", sliceCol).withColumn("__sk", shuffleKey(idCol)),
      "__slc", "__sk", idCol, tokenCountCol, "__before", subShards)
      .filter(col("__before") < tokenBudget)
      .drop("__slc", "__sk", "__before")

  /** Sequential sequence packing — the pretraining-batch construction op:
    * documents are laid out in deterministic [[shuffleKey]] order per
    * slice and cut into packs of ≈ `maxTokensPerPack` tokens (a doc
    * belongs to the pack its FIRST token lands in — whole-doc greedy
    * sequential packing; pipelines that split straddling docs do so
    * downstream at tokenization). One window per slice, no driver state;
    * pack ids are (slice, local pack number), stable under any
    * partitioning. */
  def packSequences(
      docs: DataFrame,
      idCol: Column,
      sliceCol: Column,
      tokenCountCol: Column,
      maxTokensPerPack: Long,
      subShards: Int = 256
  ): DataFrame =
    withPrefixBefore(
      docs.withColumn("__slc", sliceCol).withColumn("__sk", shuffleKey(idCol)),
      "__slc", "__sk", idCol, tokenCountCol, "__before", subShards)
      .withColumn("pack_id", floor(col("__before") / maxTokensPerPack).cast("long"))
      .drop("__slc", "__sk", "__before")

  /** Deterministic stratified train/val/test split — every pipeline's
    * first epoch-0 decision, and one that must be REPRODUCIBLE (the same
    * doc lands in the same split on any cluster, any partitioning, any
    * rerun) and INDEPENDENT of slice sizes (stratification happens because
    * the hash is uniform within every slice, not by per-slice bookkeeping).
    * `fractions` are cumulative percentage cut points, e.g.
    * Seq("train" -> 80, "val" -> 90) + default "test": a doc goes to the
    * first label whose cut point exceeds hash(id) % 100. Pure modular
    * arithmetic ([[shuffleKey]]) — no RNG state, expressible in ANSI SQL,
    * so the assignment is oracle-checkable row by row. Narrow (no shuffle
    * at all): the split is a per-row projection. */
  def stratifiedSplit(
      docs: DataFrame,
      idCol: Column,
      fractions: Seq[(String, Int)],
      defaultLabel: String
  ): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2) == fractions.map(_._2).sorted,
      "fractions must be ascending cumulative cut points")
    require(fractions.last._2 <= 100, "cut points are percentages")
    val pct = shuffleBucket(shuffleKey(idCol), 100)
    val split = fractions.foldRight(lit(defaultLabel): Column) { case ((label, cut), rest) =>
      when(pct < cut, label).otherwise(rest)
    }
    docs.withColumn("split", split)
  }

  /** Overlapping token-window chunking — the document→training-sequence
    * (and document→RAG-passage) splitter: each doc becomes
    * ceil((n-window)/stride)+1 chunks of `window` tokens starting every
    * `stride` tokens, so consecutive chunks share `window - stride`
    * tokens of context (stride = window ⇒ disjoint). Docs with ≤ window
    * tokens (including empty docs) yield exactly one whole-doc chunk —
    * chunking never drops a document.
    *
    * 100 TB design: a NARROW per-row generator (sequence + explode +
    * slice) — zero shuffles, chunk ids deterministic (doc_id, ordinal),
    * so it composes with packing/splitting downstream without
    * re-keying. Output grain: one row per (doc_id, chunk_id). */
  def chunkDocuments(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      windowTokens: Int,
      strideTokens: Int
  ): DataFrame = {
    require(windowTokens > 0 && strideTokens > 0 && strideTokens <= windowTokens,
      "need 0 < stride <= window (stride > window would drop tokens between chunks)")
    val n = size(col("__toks")).cast("long")
    val nChunks =
      when(n <= windowTokens, lit(1L))
        .otherwise(
          ceil((n - windowTokens).cast("double") / strideTokens.toDouble).cast("long") + 1L)
    docs
      .withColumn("__toks", graft.functions.TextOps.tokens(textCol))
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1)))
      .select(
        idCol.cast("long").as("doc_id"),
        col("chunk_id"),
        concat_ws(
          " ",
          slice(col("__toks"), (col("chunk_id") * strideTokens + 1).cast("int"), lit(windowTokens))
        ).as("chunk_text"),
        least(lit(windowTokens.toLong), n - col("chunk_id") * strideTokens).as("chunk_toks"))
  }

  /** Deterministic global corpus shuffle + shard assignment — the final
    * "randomize example order and write N training shards" step of every
    * pretraining data pipeline, made REPRODUCIBLE: the permutation is a
    * pure function of (id, seed), so the same corpus shuffles identically
    * on any cluster, any partitioning, any rerun — and any engine (plain
    * modular arithmetic, so the oracle replays it row for row).
    *
    * Output: the input columns (payload passthrough) plus `shard` in
    * [0, numShards) and `pos`, the 1-based position within the shard,
    * both pseudo-random; the round-robin global read order is
    * (pos-1)*numShards + shard. [[graft.sources.Sinks.writeTrainingShards]]
    * materializes this as one shard directory per value in stored order.
    *
    * 100 TB design: this is the one operation whose JOB is a full-corpus
    * shuffle — the design point is to pay exactly ONE. The shard
    * assignment is a narrow projection, and the within-shard position is
    * the hierarchical prefix count of [[withPrefixBefore]] (sub-shards on
    * the key's high bits nest EXACTLY inside shards:
    * ⌊⌊key·n·m/2³²⌋/m⌋ = ⌊key·n/2³²⌋), so per-task sorts shrink with the
    * fan-out even when numShards is small relative to cores. No global
    * single-partition window, no driver state. */
  def globalShuffle(
      docs: DataFrame,
      idCol: Column,
      numShards: Int,
      seed: Long,
      subShardsPerShard: Int = 256
  ): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    // Seed bounded so id+seed stays far from BIGINT overflow on any engine
    // (ANSI engines raise on overflow rather than wrapping).
    require(seed >= 0 && seed < (1L << 31), "seed must be in [0, 2^31)")
    require(subShardsPerShard > 0, "subShardsPerShard must be positive")
    val totalSs = math.min(numShards.toLong * subShardsPerShard, 1L << 20).toInt
    val base = docs // passthrough: all caller columns survive (the payload ships with its shard)
      .withColumn("__k", shuffleKey(idCol.cast("long") + lit(seed)))
      .withColumn("shard", shuffleBucket(col("__k"), numShards))
    withPrefixBefore(base, "shard", "__k", idCol, lit(1L), "__before", totalSs)
      .withColumn("pos", col("__before") + 1L)
      .drop("__k", "__before")
  }

  /** Curriculum ordering: bucket documents by a [0, 1] quality score and
    * assign a deterministic pseudo-random position WITHIN each bucket —
    * the data-side half of quality-curriculum training (feed high-quality
    * buckets first, or last, or anneal across them: the consumption order
    * is the trainer's choice; this op gives it a reproducible
    * (q_bucket, pos) coordinate per doc, shuffled within buckets so a
    * bucket is not consumed in corpus order).
    *
    * Bucket = ⌊quality·buckets⌋ clamped to [0, buckets-1] — fixed
    * thresholds, NOT quantiles: quantile buckets need a global sort or a
    * percentile pass over the corpus, while fixed thresholds are a narrow
    * map and mean the same score lands in the same bucket across shards,
    * epochs, and engines. Callers wanting calibrated buckets rescale the
    * score upstream (the classifier is a config artifact anyway).
    *
    * 100 TB design: buckets are FEW, so a window partitioned by bucket
    * alone would sort corpus/buckets rows on ONE task each — the
    * single-reducer sort this library refuses everywhere else. The
    * position is therefore the hierarchical prefix count of
    * [[withPrefixBefore]] (sub-shard on the key's high bits, rank
    * locally, lift with the dimension-sized offset table); the composed
    * rank equals the single-window rank row for row (law in MixtureSpec,
    * any subShards), and the oracle replays it — pure modular arithmetic
    * + IEEE ops on an already-rounded score. */
  def curriculumOrder(
      docs: DataFrame,
      idCol: Column,
      qualityCol: Column, // [0, 1]; pre-round (e.g. round(.,6)) for cross-engine bucket stability
      buckets: Int,
      seed: Long,
      subShards: Int = 256
  ): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(seed >= 0 && seed < (1L << 31), "seed must be in [0, 2^31)")
    val base = docs
      .withColumn(
        "q_bucket",
        greatest(least(floor(qualityCol * buckets).cast("long"), lit(buckets - 1L)), lit(0L)))
      .withColumn("__k", shuffleKey(idCol.cast("long") + lit(seed)))
    withPrefixBefore(base, "q_bucket", "__k", idCol, lit(1L), "__before", subShards)
      .withColumn("pos", col("__before") + 1L)
      .drop("__k", "__before")
  }

  /** Temperature-flattened mixture weights — the standard multilingual /
    * multi-source rebalancing rule (exponential smoothing, as in
    * mBERT/XLM-R-style sampling): slice budgets ∝ (n_slice/N)^(1/T).
    * T = 1 reproduces natural proportions; T → ∞ approaches uniform;
    * 1 < T < ∞ up-samples small slices without letting any slice dominate.
    * Returns one row per slice — (slice, slice_toks, budget_frac,
    * token_budget) — shaped to feed [[sampleToTokenBudgets]] directly:
    * compute the mixture, then sample to it.
    *
    * 100 TB design: one map-side-combined hash agg to slice grain, then
    * all arithmetic on the DIMENSION-sized slice frame (1-row totals
    * broadcast twice); the corpus is scanned once and never re-keyed. */
  def temperatureBudgets(
      docs: DataFrame,
      sliceCol: Column,
      tokenCountCol: Column,
      temperature: Double,
      totalBudget: Long
  ): DataFrame = {
    require(temperature > 0.0, "temperature must be positive")
    require(totalBudget > 0L, "totalBudget must be positive")
    val counts = docs
      .groupBy(sliceCol.as("slice"))
      .agg(sum(tokenCountCol).cast("long").as("slice_toks"))
    val tot = counts.agg(sum("slice_toks").cast("long").as("__n"))
    val withW = counts
      .crossJoin(broadcast(tot))
      .withColumn(
        "__w",
        pow(col("slice_toks").cast("double") / col("__n").cast("double"),
          lit(1.0 / temperature)))
    withW
      .crossJoin(broadcast(withW.agg(sum("__w").as("__wsum"))))
      .select(
        col("slice"),
        col("slice_toks"),
        round(col("__w") / col("__wsum"), 6).as("budget_frac"),
        round(lit(totalBudget.toDouble) * col("__w") / col("__wsum"))
          .cast("long").as("token_budget"))
  }

  /** Per-slice budgets — the actual mixture shape ("web 60B, books 30B,
    * code 10B tokens"). `budgets` is a (slice, token_budget) frame; it is
    * dimension-sized (one row per slice), so it broadcasts. Slices absent
    * from `budgets` are DROPPED (an unlisted slice has no place in the
    * mix); list a slice with Long.MaxValue to keep it whole. */
  def sampleToTokenBudgets(
      docs: DataFrame,
      idCol: Column,
      sliceCol: Column,
      tokenCountCol: Column,
      budgets: DataFrame, // (slice, token_budget)
      subShards: Int = 256
  ): DataFrame =
    withPrefixBefore(
      docs
        .join(
          broadcast(budgets.toDF("__slice", "__budget")),
          sliceCol === col("__slice"))
        .withColumn("__slc", sliceCol)
        .withColumn("__sk", shuffleKey(idCol)),
      "__slc", "__sk", idCol, tokenCountCol, "__before", subShards)
      .filter(col("__before") < col("__budget"))
      .drop("__slice", "__budget", "__slc", "__sk", "__before")

  /** First-fit-decreasing bin packing of sequences into fixed-capacity
    * packs — the SFT/fine-tuning batch packer. [[packSequences]] is the
    * right pretraining packer (documents concatenate and split across
    * pack boundaries, so sequential cumsum assignment wastes nothing);
    * FFD is the right packer when sequences must NOT split (chat
    * transcripts, instruction pairs): it minimizes padding waste, with
    * the classic 11/9·OPT+6/9 bin guarantee vs sequential next-fit's
    * 2·OPT.
    *
    * Distribution contract: FFD is inherently sequential PER GROUP, so
    * groups must be bounded. Items hash-split into `subGroups` sub-groups
    * per slice ([[shuffleBucket]] on the id — deterministic on any
    * partitioning/engine), FFD runs independently inside each via
    * `flatMapGroups` (one shuffle on the group key; per-task memory =
    * one sub-group's items, sized like a training shard — NOT the slice).
    * Pack keys are hierarchical (`slice/sub/local`), the same
    * prefix-machinery convention as the curriculum ranks. Oversized
    * items (n_tok > cap) get a singleton pack, flagged `oversize`.
    *
    * Output: (slice, doc_id, n_tok, pack_key, oversize). Not ANSI-SQL
    * expressible (the bin state is a loop carry) → registered rows-only;
    * conservation / capacity / beats-sequential / partitioning-
    * independence laws live in MixtureSpec. */
  def packFirstFitDecreasing(
      docs: DataFrame,
      idCol: Column,
      sliceCol: Column,
      tokenCountCol: Column,
      maxTokensPerPack: Long,
      subGroups: Int = 1
  ): DataFrame = {
    require(maxTokensPerPack > 0, "pack capacity must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val in = docs.select(
      sliceCol.cast("string").as("slice"),
      idCol.cast("long").as("doc_id"),
      tokenCountCol.cast("long").as("n_tok"),
      shuffleBucket(shuffleKey(idCol), subGroups).as("sub"))
    in.as[(String, Long, Long, Long)]
      .groupByKey(r => (r._1, r._4))
      .flatMapGroups { (key: (String, Long), it: Iterator[(String, Long, Long, Long)]) =>
        val (slice, sub) = key
        // FFD: largest first (ties by id for determinism), each item into
        // the FIRST bin it fits; opens a new bin when none fits.
        val items = it.toArray.sortBy { case (_, id, tok, _) => (-tok, id) }
        val binRemaining = scala.collection.mutable.ArrayBuffer.empty[Long]
        items.iterator.map { case (_, id, tok, _) =>
          val fit = binRemaining.indexWhere(_ >= tok)
          val bin =
            if (fit >= 0) { binRemaining(fit) -= tok; fit }
            else { binRemaining += (maxTokensPerPack - tok).max(0L); binRemaining.length - 1 }
          (slice, id, tok, s"$slice/$sub/$bin", tok > maxTokensPerPack)
        }
      }
      .toDF("slice", "doc_id", "n_tok", "pack_key", "oversize")
  }
}
