package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Tokenizer-vocabulary construction and corpus encoding (SURVEY §2.D D5
  * extension) — the front half of tokenizer training (word-frequency
  * vocabulary with coverage accounting, the first pass of BPE/WordPiece
  * training per Sennrich et al. 2016) and the token→id encoding pass that
  * turns a text corpus into the integer sequences a trainer consumes.
  *
  * 100 TB shape: vocab build is one explode → partial+final hash agg on
  * the token key, then a TakeOrderedAndProject top-k — the only window
  * runs over the k surviving rows (vocab-sized, never corpus-sized).
  * Encoding broadcasts the vocab (bounded by construction) against the
  * exploded corpus, then re-assembles per-doc id arrays with a
  * sort_array(collect_list(struct(pos,id))) — collect_list alone is not
  * order-stable, the struct sort is what makes the array deterministic on
  * any partitioning.
  */
object Vocab {

  /** Top-`size` tokens by (count desc, token): (vocab_id, tok, cnt,
    * cum_share). vocab_id is 1-based; 0 is reserved for UNK in encode().
    * cum_share = cumulative token-count share of the whole corpus — the
    * coverage curve a vocab-size decision reads. Exact long arithmetic up
    * to the final division; cum_share rounded to 1e-9. */
  def build(docs: DataFrame, textCol: Column, size: Int): DataFrame = {
    val counts = docs
      .select(explode(TextOps.tokens(textCol)).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total_tok"))
    // Bounded BEFORE the windows: orderBy+limit is a distributed
    // TakeOrderedAndProject; the rank/cumsum windows then see k rows.
    val top = counts.orderBy(col("cnt").desc, col("tok")).limit(size)
    val w = Window.orderBy(col("cnt").desc, col("tok"))
    top
      .crossJoin(broadcast(total))
      .withColumn("vocab_id", row_number().over(w).cast("long"))
      .withColumn(
        "cum_share",
        round(
          sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double") / col("total_tok"),
          9))
      .select(col("vocab_id"), col("tok"), col("cnt"), col("cum_share"))
  }

  /** Encode each doc to its token-id sequence against a (vocab_id, tok)
    * vocabulary; out-of-vocab tokens map to UNK = 0. Output: (doc_id,
    * n_tok, n_unk, ids). The vocab side broadcasts; per-doc arrays are
    * re-assembled position-sorted so the result is partitioning-stable. */
  def encode(docs: DataFrame, idCol: Column, textCol: Column, vocab: DataFrame): DataFrame = {
    // posexplode_OUTER: a zero-token document must still surface as
    // (doc_id, 0, 0, []) — the every-input-doc contract the sibling passes
    // keep (LmScore.score via explode_outer, duplicateSpanRemoval).
    val exploded = docs
      .select(idCol.cast("long").as("doc_id"), posexplode_outer(TextOps.tokens(textCol)).as(Seq("pos", "tok")))
    exploded
      .join(broadcast(vocab.select(col("tok"), col("vocab_id"))), Seq("tok"), "left")
      .withColumn("id", coalesce(col("vocab_id"), lit(0L)))
      .groupBy(col("doc_id"))
      .agg(
        count(col("tok")).as("n_tok"),
        sum(when(col("tok").isNotNull && col("vocab_id").isNull, 1L).otherwise(0L)).as("n_unk"),
        sort_array(collect_list(when(col("tok").isNotNull, struct(col("pos"), col("id"))))).as("pi"))
      .withColumn("ids", transform(col("pi"), x => x.getField("id")))
      .select(col("doc_id"), col("n_tok"), col("n_unk"), col("ids"))
  }
}
