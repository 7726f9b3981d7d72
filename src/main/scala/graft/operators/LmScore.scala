package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** CCNet-style language-model quality scoring (SURVEY §2.D D5 extension):
  * train a unigram LM on a reference slice of the corpus, then score every
  * document by its total/mean token log-probability — the classic
  * "perplexity against a clean-corpus LM" filter (Wenzek et al., CCNet,
  * LREC'20) that ranks fluent prose above boilerplate and gibberish.
  *
  * The model IS a DataFrame — (token, log-prob) plus one out-of-vocabulary
  * sentinel row — so a retrained or external LM is a data swap, exactly
  * like the `d5_quality_score` weight vector. Log-probs are add-one
  * smoothed: p(t) = (c(t)+1) / (N+V+1), with the +1 in the denominator
  * funding the OOV mass, and are stored in integer MICRO-units
  * (round(ln p × 1e6)) so per-document sums are exact long arithmetic —
  * order-independent on any partitioning, and the only cross-engine
  * floating-point op (one `ln` per VOCAB entry, not per token) is rounded
  * to a grid ~1e9 ULPs wide at typical magnitudes, far below any libm
  * divergence.
  *
  * 100 TB design: training is one explode + hash-agg over the reference
  * slice (map-side combined); scoring is explode → broadcast-join the
  * vocab (dimension-sized: ~10⁷ rows even for web-scale corpora) → one
  * hash-agg back to doc grain. No corpus-sized shuffle on the vocab side;
  * the two doc-grain shuffles are keyed on doc id.
  */
object LmScore {

  /** OOV sentinel token: [[TextOps.tokens]] drops empty strings, so the
    * empty string can never collide with a real vocab entry. */
  val OovToken = ""

  private def lpMicro(num: Column, den: Column): Column =
    round(log(num.cast("double") / den.cast("double")) * 1e6).cast("long")

  /** Raw unigram counts (token, c) — the MERGEABLE form of the model.
    * Keep counts, not log-probs, as the stored artifact: counts of two
    * corpus shards merge by addition ([[mergeCounts]]), so when a new
    * crawl shard arrives the LM updates with one shard-sized aggregation
    * instead of a full-corpus retrain — the LM twin of the dedup
    * signature store and the IVF index's incremental add. */
  def unigramCounts(docs: DataFrame, textCol: Column): DataFrame =
    // tokenize-bound scan stage: rebalance if the source under-partitions
    // (a single-row-group corpus file serializes the whole count pass on
    // one core — profiled 3.4 s of d0_corpus_prep_full's 6.9 s at sf0.1)
    graft.tables.Tables.rebalanceForCpu(docs)
      .select(explode(TextOps.tokens(textCol)).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("c"))

  /** Merge two [[unigramCounts]] frames: counts add. Exactly equals
    * counting the concatenated corpora (law in LmScoreSpec). */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("token").agg(sum("c").as("c"))

  /** Derive the smoothed (token, lp_micro) scoring frame from a counts
    * frame — cheap (vocab-sized), so it reruns after every merge. */
  def lmFromCounts(counts: DataFrame): DataFrame = {
    // One row: corpus size N and vocab size V. Broadcast into every vocab
    // row; both engines compute identical (c+1)/(N+V+1) doubles.
    val totals = counts.agg(sum("c").as("n_total"), count(lit(1)).as("v"))
    val oov = totals.select(
      lit(OovToken).as("token"),
      lpMicro(lit(1L), col("n_total") + col("v") + 1).as("lp_micro"))
    counts
      .crossJoin(broadcast(totals))
      .select(
        col("token"),
        lpMicro(col("c") + 1, col("n_total") + col("v") + 1).as("lp_micro"))
      .unionByName(oov)
  }

  /** Train an add-one-smoothed unigram LM: (token, lp_micro) for every
    * token in `docs`, plus the [[OovToken]] row carrying the unseen-token
    * log-prob ln(1/(N+V+1)). One-shot form of
    * [[unigramCounts]] → [[lmFromCounts]]. */
  def trainUnigram(docs: DataFrame, textCol: Column): DataFrame =
    lmFromCounts(unigramCounts(docs, textCol))

  /** Vocab ceiling for [[asMapRow]]: 2²⁰ entries ≈ tens of MB as one map
    * row — comfortably inside broadcast/row-size limits. Reference-corpus
    * LMs (the gate's intended model, ~10⁴–10⁵ types) sit far below it;
    * web-scale vocabs (10⁷+) belong in the exploded [[score]] join. */
  val DefaultMaxMapVocab: Long = 1L << 20

  /** Collapse an LM frame into ONE row — (`__lm_map`: token→lp_micro,
    * `__oov_lp`) — for NARROW scoring: cross-join the broadcast row and
    * fold a token array with [[lpSumMicro]], no explode, no doc-grain
    * re-aggregation shuffle. The map is runtime data shipped once per
    * executor (broadcast), never inlined into generated code, so vocab
    * size does not affect codegen. This is the form pipeline GATES use
    * ([[graft.pipelines.CorpusPrep]]); the exploded [[score]] form is the
    * standalone analytics query.
    *
    * GUARDED: packing the vocab into one row has a hard ceiling — a
    * web-scale LM would smuggle a hundreds-of-MB single row into the
    * broadcast (and through every row-size-limited channel on the way).
    * The guard counts the vocab (one agg over the vocab-sized frame; the
    * checkpoint keeps a lazy trainUnigram plan to ONE training pass,
    * shared with the aggregation below) and refuses above `maxVocab` —
    * callers with a bigger model use [[score]]'s exploded join, which
    * distributes the vocab across ordinary rows
    * ([[graft.pipelines.CorpusPrep]] falls back automatically). */
  def asMapRow(lm: DataFrame, maxVocab: Long = DefaultMaxMapVocab): DataFrame = {
    val lmOnce = lm.localCheckpoint()
    val vocab  = lmOnce.filter(col("token") =!= OovToken).count()
    require(
      vocab <= maxVocab,
      s"asMapRow: vocab size $vocab exceeds maxVocab $maxVocab — a map this large must not " +
        "ship as one row; score documents with LmScore.score's exploded vocab join instead")
    lmOnce.agg(
      map_from_entries(
        collect_list( // when() without otherwise → null for the sentinel → skipped
          when(col("token") =!= OovToken, struct(col("token"), col("lp_micro"))))
      ).as("__lm_map"),
      max(when(col("token") === OovToken, col("lp_micro"))).as("__oov_lp"))
  }

  /** Exact total log-prob (micro-units) of a token array against an
    * [[asMapRow]] map column — one broadcast lookup per token, pure
    * Column fold. Mean-threshold gates should compare
    * `lpSumMicro >= threshold * size(toks)` to stay integer-exact. */
  def lpSumMicro(toks: Column, lmMap: Column, oovLp: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + coalesce(element_at(lmMap, t), oovLp))

  /** Score each document against `lm` ([[trainUnigram]] output or any
    * (token, lp_micro) frame containing an [[OovToken]] row): per-doc
    * token count and EXACT total log-prob in micro-units. Empty documents
    * score (0, 0) — no tokens, no evidence. Mean log-prob / perplexity
    * are derived columns left to the caller (`lp_sum / n_toks`). */
  def score(docs: DataFrame, idCol: Column, textCol: Column, lm: DataFrame): DataFrame = {
    // `lm` is consumed twice below (vocab broadcast + OOV row). When the
    // caller passes a LAZY trainUnigram plan, both consumers would re-run
    // the corpus-wide counting aggregation — the dual-consumption cost
    // bug pattern (one extra full-corpus pass at 100 TB). The frame is
    // vocab-sized, so an eager executor-local materialization is cheap
    // and bounds the training pass to exactly one. Already-materialized
    // LMs (read from parquet) pay one no-op-sized checkpoint.
    val lmOnce = lm.localCheckpoint()
    val oovLp = lmOnce
      .filter(col("token") === OovToken)
      .select(col("lp_micro").as("__oov_lp"))
    val vocab = lmOnce
      .filter(col("token") =!= OovToken)
      .select(col("token").as("__tok"), col("lp_micro"))
    docs
      .select(idCol.cast("long").as("doc_id"), TextOps.tokens(textCol).as("toks"))
      .select(col("doc_id"), explode_outer(col("toks")).as("token"))
      .join(broadcast(vocab), col("token") === col("__tok"), "left")
      .crossJoin(broadcast(oovLp))
      .groupBy(col("doc_id"))
      .agg(
        count(col("token")).as("n_toks"),
        coalesce(
          sum(when(col("token").isNotNull, coalesce(col("lp_micro"), col("__oov_lp")))),
          lit(0L)).as("lp_sum"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169): weight
    * every document by how much more likely a TARGET-domain n-gram LM
    * finds it than a RAW-corpus LM — w(x) = log p_tgt(x) − log p_raw(x)
    * summed over the doc's tokens. Rank-descending w and keeping the top
    * budget IS the data-selection step (deterministic variant of the
    * paper's Gumbel-top-k; ties broken by doc_id).
    *
    * Both log-probs are the integer micro-unit sums of [[score]], so
    * w_micro is exact long arithmetic — identical on any partitioning and
    * hash-comparable cross-engine. Docs with zero tokens carry no
    * evidence and weight 0.
    *
    * 100 TB design: ONE corpus scan — explode, left-join BOTH broadcast
    * vocab dimensions (each vocab is dimension-sized next to the corpus),
    * one doc-grain hash agg; never two scoring passes. The two LM
    * trainings are slice-sized aggregations done once beforehand.
    *
    * Output: (doc_id, n_toks, lp_target, lp_raw, w_micro) for every doc.
    */
  def importanceWeights(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      targetLm: DataFrame,
      rawLm: DataFrame
  ): DataFrame = {
    // Same dual-consumption bound as score(): each LM frame feeds a vocab
    // dim and an OOV row — checkpoint keeps lazy trainUnigram plans to one
    // training pass apiece.
    val tgtOnce = targetLm.localCheckpoint()
    val rawOnce = rawLm.localCheckpoint()
    val tgtVocab = tgtOnce
      .filter(col("token") =!= OovToken)
      .select(col("token").as("__tok_t"), col("lp_micro").as("__lp_t"))
    val rawVocab = rawOnce
      .filter(col("token") =!= OovToken)
      .select(col("token").as("__tok_r"), col("lp_micro").as("__lp_r"))
    val oovs = tgtOnce
      .filter(col("token") === OovToken)
      .select(col("lp_micro").as("__oov_t"))
      .crossJoin(rawOnce.filter(col("token") === OovToken).select(col("lp_micro").as("__oov_r")))
    docs
      .select(idCol.cast("long").as("doc_id"), TextOps.tokens(textCol).as("toks"))
      .select(col("doc_id"), explode_outer(col("toks")).as("token"))
      .join(broadcast(tgtVocab), col("token") === col("__tok_t"), "left")
      .join(broadcast(rawVocab), col("token") === col("__tok_r"), "left")
      .crossJoin(broadcast(oovs))
      .groupBy(col("doc_id"))
      .agg(
        count(col("token")).as("n_toks"),
        coalesce(
          sum(when(col("token").isNotNull, coalesce(col("__lp_t"), col("__oov_t")))),
          lit(0L)).as("lp_target"),
        coalesce(
          sum(when(col("token").isNotNull, coalesce(col("__lp_r"), col("__oov_r")))),
          lit(0L)).as("lp_raw"))
      .select(
        col("doc_id"),
        col("n_toks"),
        col("lp_target"),
        col("lp_raw"),
        (col("lp_target") - col("lp_raw")).as("w_micro"))
  }

  /** DSIR selection: top-`n` docs by importance weight (deterministic
    * tie-break on doc_id). Plans TakeOrderedAndProject — a distributed
    * per-partition top-n + driver merge of n rows, never a global sort or
    * single-reducer window. */
  def dsirSelect(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      targetLm: DataFrame,
      rawLm: DataFrame,
      n: Int
  ): DataFrame =
    importanceWeights(docs, idCol, textCol, targetLm, rawLm)
      .orderBy(col("w_micro").desc, col("doc_id"))
      .limit(n)

  /** Bigram counts (w1, w2, c2) — the order-2 analogue of
    * [[unigramCounts]], same mergeable-by-addition property. */
  def bigramCounts(docs: DataFrame, textCol: Column): DataFrame = {
    val t = TextOps.tokens(textCol)
    docs
      .select(t.as("t"))
      .filter(size(col("t")) >= 2)
      .select(
        explode(
          zip_with(
            slice(col("t"), lit(1), size(col("t")) - 1),
            slice(col("t"), lit(2), size(col("t")) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
  }

  /** Train an add-one-smoothed conditional bigram LM:
    * p(w2|w1) = (c2(w1,w2)+1) / (c1(w1)+V+1). The model frame has three
    * row kinds, distinguished by nulls — (w1, w2, lp): a seen bigram;
    * (w1, null, lp): the unseen-successor fallback for a seen w1 (c2=0);
    * (null, null, lp): the global fallback ln(1/(V+1)) for unseen w1.
    * Like the unigram LM, `ln` runs once per MODEL row (bigram-vocab-
    * sized), micro-rounded, so doc scores are exact long sums. */
  def trainBigram(docs: DataFrame, textCol: Column): DataFrame = {
    val uni = unigramCounts(docs, textCol)
      .select(col("token").as("w1"), col("c").as("c1"))
    val v  = uni.agg(count(lit(1)).as("v"))
    val bg = bigramCounts(docs, textCol)
    val lp2 = bg
      // The bigram table is the big side (O(types²) worst case); the
      // unigram vocab is dimension-sized and must broadcast.
      .join(broadcast(uni), Seq("w1"))
      .crossJoin(broadcast(v))
      .select(
        col("w1"), col("w2"),
        lpMicro(col("c2") + lit(1.0), col("c1") + col("v") + lit(1.0)).as("lp_micro"))
    val lpFallback = uni
      .crossJoin(broadcast(v))
      .select(
        col("w1"), lit(null).cast("string").as("w2"),
        lpMicro(lit(1.0), col("c1") + col("v") + lit(1.0)).as("lp_micro"))
    val lpGlobal = v.select(
      lit(null).cast("string").as("w1"), lit(null).cast("string").as("w2"),
      lpMicro(lit(1.0), col("v") + lit(1.0)).as("lp_micro"))
    lp2.unionByName(lpFallback).unionByName(lpGlobal)
  }

  /** Score every doc against a [[trainBigram]] model: (doc_id,
    * n_bigrams, lp_total_micro, mean_lp). Docs with <2 tokens carry no
    * bigram evidence → (0, 0, null). The three model slices broadcast
    * (model is reference-corpus-bounded); the per-pair lp resolves
    * seen-bigram → seen-w1 fallback → global, then one exact long sum
    * back to doc grain. */
  def scoreBigram(docs: DataFrame, idCol: Column, textCol: Column, model: DataFrame): DataFrame = {
    val modelOnce = model.localCheckpoint() // three consumers; bound training to one pass
    val seen = modelOnce
      .filter(col("w1").isNotNull && col("w2").isNotNull)
      .select(col("w1"), col("w2"), col("lp_micro").as("__lp2"))
    val fall = modelOnce
      .filter(col("w1").isNotNull && col("w2").isNull)
      .select(col("w1"), col("lp_micro").as("__lpf"))
    val glob = modelOnce
      .filter(col("w1").isNull)
      .select(col("lp_micro").as("__lpg"))
    val t = TextOps.tokens(textCol)
    // explode_outer over a (possibly empty) pair array keeps no-bigram
    // docs as one null row — the same single-pass shape as score(): one
    // explode, broadcast model joins, ONE doc-grain agg. No second
    // corpus-sized join to re-attach empty docs.
    val pairs = when(
      size(col("t")) >= 2,
      zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    docs
      .select(idCol.cast("long").as("doc_id"), t.as("t"))
      .select(col("doc_id"), explode_outer(pairs).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .join(broadcast(seen), Seq("w1", "w2"), "left")
      .join(broadcast(fall), Seq("w1"), "left")
      .crossJoin(broadcast(glob))
      .groupBy(col("doc_id"))
      .agg(
        count(col("w1")).as("n_bigrams"), // null w1 = the empty-doc marker row
        coalesce(
          sum(when(col("w1").isNotNull, coalesce(col("__lp2"), col("__lpf"), col("__lpg")))),
          lit(0L)).as("lp_total_micro"))
      .select(
        col("doc_id"),
        col("n_bigrams"),
        col("lp_total_micro"),
        round(
          col("lp_total_micro").cast("double")
            / nullif(col("n_bigrams"), lit(0L)) / 1e6,
          6).as("mean_lp"))
  }
}
