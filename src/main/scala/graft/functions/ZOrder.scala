package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — the multi-dimension file-skipping
  * technique: sort by an interleaved-bit key and every output file covers
  * a small rectangle of the 2-D key space, so parquet min/max stats prune
  * files for predicates on EITHER column
  * ([[graft.catalyst.InterleaveBitsExpression]] carries the full design
  * note; [[graft.sources.Sinks.writeClustered]] is the write path).
  */
object ZOrder {

  /** Morton key of two BIGINT columns (low 31 bits each) — the native
    * codegen expression via its SQL registration. */
  def interleaveBits(spark: SparkSession, x: Column, y: Column): Column = {
    graft.catalyst.GraftExtensions.register(spark)
    call_function("graft_interleave_bits", x, y)
  }

  /** 3-D Morton key ([[graft.catalyst.Morton3Expression]]) — 20 bits per
    * dimension, round-robin interleaved. Pre-scale inputs with
    * [[scaleToBits]](…, bits ≤ 20). */
  def morton3(spark: SparkSession, x: Column, y: Column, z: Column): Column = {
    graft.catalyst.GraftExtensions.register(spark)
    call_function("graft_morton3", x, y, z)
  }

  /** Min-max scale a numeric column into [0, 2^bits): the normalization
    * step before interleaving — Z-order needs both dimensions on
    * comparable integer scales or the wider-range column dominates the
    * key. `lo`/`hi` are the column's bounds (from a stats pass or table
    * metadata); a constant column (hi == lo) maps to 0. */
  def scaleToBits(v: Column, lo: Column, hi: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val buckets = (1L << bits) - 1
    when(hi <= lo, lit(0L)).otherwise(
      ((v.cast("double") - lo.cast("double")) * buckets /
        (hi.cast("double") - lo.cast("double"))).cast("long"))
  }
}
