package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** BM25 ranking over the documents table (SURVEY §2.D D6 extension) — the
  * standard lexical retrieval scorer (Robertson & Zaragoza, "The
  * Probabilistic Relevance Framework: BM25 and Beyond", FnTIR 2009), the
  * term-based half of a RAG retrieval stack next to the D4 vector side.
  * Uses the Lucene-style smoothed idf ln((N − df + 0.5)/(df + 0.5) + 1),
  * which never goes negative.
  *
  * 100 TB shape: the corpus-sized work is one token explode FILTERED to
  * the query's terms before any shuffle (the match stream is
  * |hits|-sized, not corpus-sized) plus one corpus scan for N/avgdl; df
  * and the per-(doc, term) tf are keyed aggs on the match stream; the
  * query-term df table is term-count-sized and broadcasts. Scoring a
  * query panel (the serving shape) reuses the same plan with terms from
  * an exploded panel — the filter becomes a broadcast semi-join. */
object Bm25 {

  /** Score every matching doc: (doc_id, n_matched, bm25), bm25 rounded to
    * 1e-6 for cross-engine hash equality. Docs sharing no term with the
    * query score 0 and are omitted (ranking only orders matches). */
  def score(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame =
    scoreTokenized(
      docs.select(idCol.cast("long").as("doc_id"), TextOps.tokens(textCol).as("toks")),
      queryTerms, k1, b)

  /** [[score]] over a PRE-TOKENIZED (doc_id, toks) frame — the shape a
    * caller that scores the same corpus repeatedly (pseudo-relevance
    * feedback, query panels) wants: tokenize once, checkpoint, score many
    * times (guide §1.2 — don't recompute what a pass already produced).
    * Identical math to [[score]]; `score` IS this on an inline tokenize. */
  def scoreTokenized(
      toks: DataFrame, // (doc_id long, toks array<string>)
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val stats = toks.agg(
      count(lit(1)).as("n_docs"),
      avg(size(col("toks")).cast("double")).as("avgdl"))
    val tf = toks
      .select(col("doc_id"), size(col("toks")).cast("double").as("dl"), explode(col("toks")).as("t"))
      .filter(col("t").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("t")) // dl is functionally dependent on doc_id
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df")) // tf rows are unique per (doc, t)
    tf.join(broadcast(dfreq), "t")
      .crossJoin(broadcast(stats))
      .withColumn(
        "idf",
        log(
          (col("n_docs").cast("double") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn(
        "s",
        col("idf") * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      // Per-term scores land on a 1e-12 integer grid before the doc-grain
      // sum (the LmScore micro-unit convention): double addition is not
      // associative, so a raw sum(double) could differ in the last ULP
      // across partitionings/engines; long sums are exact on any
      // partitioning and the grid sits far below the 1e-6 output rounding.
      .withColumn("s_micro", round(col("s") * 1e12).cast("long"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_matched"),
        round(sum(col("s_micro")).cast("double") / 1e12, 6).as("bm25"))
  }
}
