package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** SFT / chat-format data preparation (SURVEY §2.D D7 extension) — the
  * assembly pass that turns an interaction log into supervised fine-tuning
  * conversations: ordered turns with alternating roles, chat-template
  * token overhead, and the LOSS MASK accounting every SFT trainer needs
  * (loss is computed on assistant tokens only; user/system tokens are
  * context). Mirrors the turn/masking conventions of public SFT pipelines
  * (e.g. the chat-template `assistant`-only label masking popularized by
  * instruction-tuning recipes).
  *
  * 100 TB shape: one `row_number` window per conversation partition (the
  * shuffle key is the conversation id — the natural partitioner for any
  * downstream per-conversation pass) followed by a map-side-combined hash
  * aggregation on the SAME key, so AQE coalesces the two stages onto one
  * exchange. No data-sized state anywhere; conversations never need to fit
  * in memory jointly, only per-group iterators.
  */
object ChatPrep {

  /** Flatten an event log into chat turns: one row per turn with
    * (conv_id, turn_idx, role, n_tok). Roles alternate user/assistant in
    * turn order (odd turn_idx = user — the prompt side speaks first).
    * `n_tok` counts the turn text's whitespace tokens plus
    * `overheadToks` chat-template tokens (role header + separators).
    * `tieCol` breaks timestamp ties deterministically. */
  def turns(
      events: DataFrame,
      convCol: Column,
      tsCol: Column,
      tieCol: Column,
      textCol: Column,
      overheadToks: Int = 4
  ): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("ts"), col("tie"))
    events
      .select(
        convCol.cast("long").as("conv_id"),
        tsCol.as("ts"),
        tieCol.as("tie"),
        textCol.as("turn_text"))
      .withColumn("turn_idx", row_number().over(w).cast("long"))
      .withColumn("role", when(col("turn_idx") % 2 === 1, lit("user")).otherwise(lit("assistant")))
      .withColumn("n_tok", (size(TextOps.tokens(col("turn_text"))) + overheadToks).cast("long"))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("turn_text"), col("n_tok"))
  }

  /** Per-conversation SFT accounting over [[turns]] output: turn count,
    * total template tokens, loss-masked (assistant) tokens, and the loss
    * fraction — the signal that decides whether a conversation is worth
    * its sequence-length budget (a conv that is 95% context trains
    * almost nothing per token). */
  def convStats(turns: DataFrame): DataFrame =
    turns
      .groupBy(col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(col("n_tok")).as("total_toks"),
        sum(when(col("role") === "assistant", col("n_tok")).otherwise(0L)).as("loss_toks"))
      .withColumn(
        "loss_frac",
        round(col("loss_toks").cast("double") / col("total_toks").cast("double"), 6))
}
