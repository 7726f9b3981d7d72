package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
  * the standard way hybrid retrieval combines a lexical (BM25, D6) and a
  * vector (cosine top-k, D4) ranked list without score calibration:
  * fused(d) = Σ over lists of 1 / (k0 + rank_list(d)), k0 = 60.
  *
  * 100 TB shape: inputs are already top-k lists (k rows each — the
  * retrieval operators bound them via TakeOrderedAndProject, never a
  * global sort), so fusion itself touches k·lists rows: a unionByName and
  * one tiny keyed agg. Rank terms land on a 1e-12 integer grid before the
  * sum (the LmScore/Bm25 micro-unit convention) so the fused score is
  * partitioning- and engine-independent even with many lists.
  */
object Rrf {

  /** Rank a score table into a 1-based rank list. Callers pass a frame
    * ALREADY bounded to top-k (orderBy+limit compiles to distributed
    * TakeOrderedAndProject); the window then ranks only those k rows, so
    * the single-partition window input is k-sized, never corpus-sized.
    */
  def rankList(topK: DataFrame, idCol: String, scoreCol: String): DataFrame =
    topK.select(
      col(idCol).cast("long").as("id"),
      row_number()
        .over(Window.orderBy(col(scoreCol).desc, col(idCol)))
        .as("rank"))

  /** Fuse 1-based rank lists of (id, rank). Output: (id, n_lists,
    * best_rank, rrf) — rrf rounded to 1e-6 for cross-engine equality. */
  def fuse(lists: Seq[DataFrame], k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrf: need at least one ranked list")
    val tagged = lists.map(_.select(col("id"), col("rank")))
    tagged
      .reduce(_.unionByName(_))
      // 1/(k0+rank) on the integer micro grid: long sums are exact on any
      // partitioning; doubles would drift in the last ULP across engines.
      .withColumn("s_micro", round(lit(1e12) / (lit(k0) + col("rank"))).cast("long"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_lists"),
        min(col("rank")).cast("long").as("best_rank"),
        round(sum(col("s_micro")).cast("double") / 1e12, 6).as("rrf"))
  }
}
