package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.Dedup

/** The canonical LLM training-data preparation DAG, composed from the
  * engine's operators (north star: BASELINE.json — dedup, text analysis,
  * quality at 100 TB):
  *
  *   exact dedup → near-dup dedup (MinHash/LSH) → quality gate →
  *   language gate → enrichment (tokens, fingerprint, quality features)
  *
  * Every stage is a keyed shuffle or a narrow map; nothing touches the
  * driver. The near-dup stage drops the higher doc id of each verified
  * pair (deterministic survivor choice), mirroring the keep-lowest rule of
  * exact dedup.
  */
object CorpusPrep {

  final case class Config(
      minhash: Dedup.MinHashParams = Dedup.MinHashParams(jaccardThreshold = 0.8),
      minTokens: Int = 5,
      maxStopwordRatio: Double = 0.9,
      langAllowlist: Seq[String] = Seq.empty // empty = keep all
  )

  /** Returns (surviving corpus with features, per-stage audit counts). */
  def prepare(docs: DataFrame, idCol: Column, textCol: Column, cfg: Config): (DataFrame, DataFrame) = {
    val total = docs.agg(count(lit(1)).as("n")).withColumn("stage", lit("input"))

    // 1. exact dedup, keep-lowest-id
    val exact = Dedup.exact(docs, textCol, idCol).drop("content_hash")

    // 2. near-dup dedup: drop the higher id of each verified pair
    val losers = Dedup
      .nearDuplicatePairs(exact, idCol, textCol, cfg.minhash)
      .select(col("doc_b").as("__loser"))
      .distinct()
    val deduped = exact.join(losers, idCol === col("__loser"), "left_anti")

    // 3+4. quality + language gates, 5. enrichment — one narrow pass
    val toks = TextOps.tokens(textCol)
    val enriched = deduped
      .withColumn("toks", toks)
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("stop_ratio", TextOps.stopwordRatio(col("toks")))
      .withColumn("pred_lang", TextOps.langId(col("toks")))
      .withColumn("fp", TextOps.fingerprint(col("toks")))
      .filter(col("n_tok") >= cfg.minTokens && col("stop_ratio") <= cfg.maxStopwordRatio)
      .filter(
        if (cfg.langAllowlist.isEmpty) lit(true)
        else col("pred_lang").isin(cfg.langAllowlist: _*)
      )
      .drop("toks")

    val audit = total
      .unionByName(exact.agg(count(lit(1)).as("n")).withColumn("stage", lit("exact_dedup")))
      .unionByName(deduped.agg(count(lit(1)).as("n")).withColumn("stage", lit("near_dedup")))
      .unionByName(enriched.agg(count(lit(1)).as("n")).withColumn("stage", lit("gated")))
    (enriched, audit)
  }
}
