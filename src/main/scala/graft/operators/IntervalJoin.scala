package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed interval (range) join — the batch scale path for
  * "right.ts ∈ [left.ts, left.ts + W]" joins (SURVEY §2.C C7 range-join
  * flavor; batch twin of [[graft.streaming.StreamOps.streamStreamIntervalJoin]]).
  *
  * The naive plan equi-joins on the key alone and evaluates the time band
  * as a post-join filter: per key-group the intermediate is |L|·|R| rows —
  * at 100 TB (dense keys, long histories) that quadratic blow-up, not the
  * shuffle, is the bottleneck. Here both sides also join on a COARSE TIME
  * BUCKET of width W: a right row lives in exactly one bucket
  * ⌊ts/W⌋, and a qualifying right row for a left row at t can only sit in
  * bucket ⌊t/W⌋ or ⌊t/W⌋+1 — so the left side explodes into those two
  * bucket keys (a fixed 2× fan-out, NOT data-dependent), the join becomes
  * a plain equi-join on (key, bucket), and the exact band predicate
  * verifies survivors. Intermediate work drops from Σ|L_k|·|R_k| to
  * Σ over (key, bucket) of the local products — bounded by time density,
  * not history length. Each qualifying pair matches exactly once (the
  * right row's bucket is single-valued), so no dedup pass is needed.
  *
  * Bucket arithmetic is exact long math on epoch micros (floor division
  * via pmod, correct for pre-1970 timestamps too); `windowMicros` is a
  * fixed duration — calendar intervals (months) have no fixed width and
  * are out of scope. Equivalence with the naive join is asserted in
  * IntervalJoinSpec; the DuckDB oracle checks b9 end-to-end.
  */
object IntervalJoin {

  private def bucketOf(ts: Column, w: Long): Column = {
    val x = unix_micros(ts)
    // Floor division on longs: x - pmod(x, w) is an EXACT multiple of w
    // (pmod is non-negative, so this floors for negative x too). The SQL
    // `/` runs in double, but an exact-multiple numerator below 2^53 —
    // epoch micros stay under 1.8e15 — divides to the exact integer
    // quotient, so the cast back to long is lossless.
    ((x - pmod(x, lit(w))) / lit(w)).cast("long")
  }

  /** Inner bucketed interval join: rows (l, r) with `keyCond` and
    * r[rightTs] ∈ [ l[leftTs], l[leftTs] + windowMicros ]. Column names of
    * `left`/`right` must be pre-disambiguated (as with the StreamOps
    * form). */
  def inner(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      windowMicros: Long,
      keyCond: Column
  ): DataFrame = {
    require(windowMicros > 0, "windowMicros must be positive")
    val l = left.withColumn(
      "__lbkt",
      explode(array(bucketOf(col(leftTs), windowMicros), bucketOf(col(leftTs), windowMicros) + 1)))
    val r    = right.withColumn("__rbkt", bucketOf(col(rightTs), windowMicros))
    val band = col(rightTs) >= col(leftTs) &&
      unix_micros(col(rightTs)) <= unix_micros(col(leftTs)) + windowMicros
    l.join(r, keyCond && col("__lbkt") === col("__rbkt") && band)
      .drop("__lbkt", "__rbkt")
  }

  /** Left-outer bucketed interval join: [[inner]] matches plus every left
    * row with no match in its window, null-extended — the batch semantics
    * of [[graft.streaming.StreamOps.streamStreamIntervalJoinLeftOuter]]
    * at watermark = ∞. Needs `leftKey`, a unique left row key, to recover
    * the unmatched side with a keyed anti-join (generating an internal row
    * id would be nondeterministic under re-planning). Both legs are keyed
    * shuffles; the union is append-only. */
  def leftOuter(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      windowMicros: Long,
      keyCond: Column,
      leftKey: Column
  ): DataFrame = {
    val matches = inner(left, right, leftTs, rightTs, windowMicros, keyCond)
    val unmatched = left
      .join(matches.select(leftKey.as("__mk")).distinct(), leftKey === col("__mk"), "left_anti")
    val nullRight = right.columns.foldLeft(unmatched) { (df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    matches.unionByName(nullRight.select(matches.columns.map(col).toIndexedSeq: _*))
  }
}
