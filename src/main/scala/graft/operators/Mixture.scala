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
      tokenBudget: Long
  ): DataFrame = {
    val w = Window
      .partitionBy(sliceCol)
      .orderBy(shuffleKey(idCol), idCol) // idCol tiebreak: total order, engine-independent
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__cum", sum(tokenCountCol).over(w))
      .filter(col("__cum") - tokenCountCol < tokenBudget)
      .drop("__cum")
  }

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
      maxTokensPerPack: Long
  ): DataFrame = {
    val w = Window
      .partitionBy(sliceCol)
      .orderBy(shuffleKey(idCol), idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("__cum", sum(tokenCountCol).over(w))
      .withColumn("pack_id", floor((col("__cum") - tokenCountCol) / maxTokensPerPack).cast("long"))
      .drop("__cum")
  }

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
    val pct = pmod(shuffleKey(idCol), lit(100L))
    val split = fractions.foldRight(lit(defaultLabel): Column) { case ((label, cut), rest) =>
      when(pct < cut, label).otherwise(rest)
    }
    docs.withColumn("split", split)
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
      budgets: DataFrame // (slice, token_budget)
  ): DataFrame = {
    val w = Window
      .partitionBy(sliceCol)
      .orderBy(shuffleKey(idCol), idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .join(
        broadcast(budgets.toDF("__slice", "__budget")),
        sliceCol === col("__slice"))
      .withColumn("__cum", sum(tokenCountCol).over(w))
      .filter(col("__cum") - tokenCountCol < col("__budget"))
      .drop("__slice", "__budget", "__cum")
  }
}
