package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Sketch-based heavy-hitter detection over the token stream (SURVEY.md
  * §2.D5 — the "what boilerplate/spam token is flooding the corpus"
  * monitor).
  *
  * The exact answer is a full token groupBy — at 100 TB that's a shuffle
  * of every token instance for a question about the top handful. This
  * operator does it with two bounded passes instead:
  *
  *  1. CANDIDATES: per-partition Misra-Gries summaries of capacity `m`
  *     (constant memory, narrow). Any token with global count
  *     > N/(m+1) must exceed n_p/(m+1) in at least one partition, so
  *     the union of partition survivors is a superset of every such
  *     heavy hitter — the classic distributed-MG guarantee, law-tested.
  *  2. ESTIMATES: one Count-Min sketch pass (Spark's mergeable
  *     `util.sketch.CountMinSketch` via `df.stat.countMinSketch`,
  *     map-side partials, fixed seed → deterministic). The sketch and
  *     the candidate list are the only driver traffic, both
  *     config-bounded (width×depth longs; ≤ m × partitions tokens).
  *
  * Exact counts for the audit columns touch only candidate tokens (the
  * token stream is broadcast-semi-joined down to candidates before the
  * groupBy), so the one keyed shuffle is candidate-sized, not
  * corpus-sized. CMS guarantees est ≥ exact and, with prob. 1-δ,
  * est ≤ exact + ε·N — both asserted in HeavyHittersSpec.
  */
object HeavyHitters {

  final case class Params(
      eps: Double = 0.0001,
      confidence: Double = 0.99,
      seed: Int = 42,
      k: Int = 20,
      mgCapacity: Int = 256)

  /** One row per token instance (the stream both passes consume). */
  def tokenStream(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(TextOps.tokens(textCol)).as("tok"))

  /** Distinct per-partition Misra-Gries survivors — the candidate set.
    * Constant memory per partition (≤ cap live counters). */
  def candidates(tokens: DataFrame, cap: Int): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens
      .select(col("tok"))
      .as[String]
      .mapPartitions { it =>
        val counts = mutable.HashMap.empty[String, Long]
        it.foreach { tok =>
          counts.get(tok) match {
            case Some(c) => counts.update(tok, c + 1)
            case None if counts.size < cap => counts.update(tok, 1L)
            case None =>
              // decrement-all; amortized against the increments that got us here
              val dead = mutable.ArrayBuffer.empty[String]
              counts.keysIterator.foreach { k =>
                val c = counts(k) - 1
                if (c == 0) dead += k else counts.update(k, c)
              }
              dead.foreach(counts.remove)
          }
        }
        counts.keysIterator
      }
      .toDF("tok")
      .distinct()
  }

  /** Top-k candidate tokens ranked by CMS estimate, with exact counts and
    * the measured overestimate. Deterministic (fixed-seed sketch, ties
    * broken on token). */
  def topK(docs: DataFrame, textCol: Column, p: Params = Params()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tokens = tokenStream(docs, textCol)
    // Both passes consume the stream; at corpus scale you'd run them over
    // the same scan — here the stream is a cheap narrow re-derivation.
    val cand = candidates(tokens, p.mgCapacity)
    val cms = tokens.stat.countMinSketch("tok", p.eps, p.confidence, p.seed)
    val est = cand
      .as[String]
      .collect() // ≤ mgCapacity × partitions rows, config-bounded
      .toSeq
      .map(t => (t, cms.estimateCount(t)))
      .toDF("tok", "cms_est")
    val exact = tokens
      .join(broadcast(cand), Seq("tok"), "left_semi")
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("exact_cnt"))
    est
      .join(exact, Seq("tok"), "left")
      .select(
        col("tok"),
        col("cms_est"),
        coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"),
        (col("cms_est") - coalesce(col("exact_cnt"), lit(0L))).as("overest"))
      .orderBy(col("cms_est").desc, col("tok"))
      .limit(p.k)
  }
}
