package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Union-MinHash sketch as a typed `Aggregator` (SURVEY.md §2.E — the
  * engine's UDAF surface): aggregates per-row MinHash signatures into the
  * signature of the UNION of the inputs by elementwise min.
  *
  * This is the textbook mergeable-sketch property that makes MinHash
  * 100 TB-friendly: `reduce` and `merge` are both elementwise min, so
  * partial aggregation (map-side combine) applies and the shuffle carries
  * one fixed-size array per group, not the data. Estimated Jaccard between
  * two groups = fraction of agreeing signature slots.
  */
class MinHashSketchAggregator(numHashes: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], row: Array[Long]): Array[Long] = {
    require(row.length == numHashes, s"signature length ${row.length} != $numHashes")
    var i = 0
    while (i < numHashes) { if (row(i) < buf(i)) buf(i) = row(i); i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = reduce(a, b)

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashSketch {

  /** Estimated Jaccard between two union sketches: agreeing-slot fraction. */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
  }

  /** Native (codegen) form of [[estimateJaccardCol]] — the hot-path choice
    * for verify joins: HOF lambdas run interpreted, the fused loop does
    * not. Divides by the ARRAY length (callers pass full signatures, so
    * this equals the numHashes division of the Column form — bit-equality
    * asserted in MinHashSketchSpec). */
  def estimateJaccardNative(
      spark: org.apache.spark.sql.SparkSession,
      a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    graft.catalyst.GraftExtensions.register(spark)
    org.apache.spark.sql.functions.call_function("graft_sig_agreement", a, b)
  }

  /** Column form of [[estimateJaccard]] — pure expression (zip_with +
    * aggregate), so a signature-vs-signature-store join can verify
    * candidates inline without a UDF. */
  def estimateJaccardCol(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column, numHashes: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    aggregate(
      zip_with(a, b, (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L),
      (acc, v) => acc + v
    ).cast("double") / numHashes
  }
}
