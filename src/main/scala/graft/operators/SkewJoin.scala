package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §7.4.6; the 100 TB
  * discipline item behind AsOfJoin's and LSH's skew notes).
  *
  * A hash join shuffles both sides on the key; a hot key (one user with
  * 10% of all events, one LSH bucket holding the spam cluster) lands on a
  * single reducer and runs at single-task speed no matter how many
  * executors exist. Salting splits each left key across `factor`
  * sub-partitions and replicates the right side `factor` ways, turning one
  * straggler into `factor` even tasks at the cost of factor× duplication
  * of the (small) right side — the classic skew/replication trade.
  *
  * AQE's skew-join handling covers sort-merge joins after the fact; the
  * explicit salt is for the cases AQE can't see (aggregation-free
  * hot-key joins, LSH buckets, stream-static enrich against hot dims).
  */
object SkewJoin {

  /** Inner equi-join `left.key == right.key`, salted `factor` ways.
    * Result is row-identical to the unsalted join. */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      factor: Int
  ): DataFrame = {
    require(factor > 0)
    // Left: deterministic pseudo-uniform salt per row (hash of the whole
    // row's partition-independent content would be ideal; a monotonic-id
    // hash gives uniform spread and any value is correct — the salt only
    // routes, it never filters).
    val salted = left.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(factor.toLong)))
    // Right: replicate each row `factor` ways so every salted left
    // sub-partition finds its match.
    val replicated = right.withColumn(
      "__salt",
      explode(array((0 until factor).map(i => lit(i.toLong)): _*))
    )
    salted
      .join(replicated, leftKey === rightKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
