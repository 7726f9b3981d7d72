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
    docs
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
}
