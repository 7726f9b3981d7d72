package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Element-wise VECTOR-SUM aggregation without `posexplode` (SURVEY §2.D
  * D3) — the centroid/moment primitive of the embedding-QC family.
  *
  * The declarative shape those queries used — explode every d-dim vector
  * into d (pos, x) rows, hash-aggregate on (group, pos) — is correct and
  * map-side combined, but pays a d× row blowup through the aggregation
  * operator: at d = 64 every million vectors push 64 M rows through the
  * hash map. A typed [[Aggregator]] folds whole arrays instead: one
  * buffer per (group, partition), updates are a tight JVM loop over the
  * array, and ONLY the d-length partial buffers shuffle (ObjectHashAgg's
  * partial+final split, identical topology to the exploded plan's
  * combine, minus the blowup).
  *
  * Exactness contract (the micro-grid convention of d3_slice_centroid and
  * friends): inputs are 1e-9-quantized LONG components, and long addition
  * is associative, so the result is bit-identical under any partitioning —
  * exactly the guarantee `sum(xq)` gave the exploded plan. Overflow
  * throws (`Math.addExact`), matching ANSI-mode `sum(long)`.
  *
  * [[sumSquares]] extends the same trick to second moments: xq² needs
  * ~2×60 bits, so each component accumulates in base-1e18 LIMBS (hi, lo) —
  * 126-bit-exact integer arithmetic in plain longs, reassembled to the
  * oracle's DECIMAL(38,0) by [[squaresToDecimal]]. (An Array[BigDecimal]
  * buffer would need a decimal-array encoder at a fixed (38,0) scale,
  * which Spark's reflection encoder cannot express — limbs are both
  * faster and encodable.)
  */
object VectorAgg {

  private val LIMB = 1000000000000000000L // 1e18

  private implicit val longArrayEnc: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  private object LongVectorSum extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], a: Array[Long]): Array[Long] = add(b, a)
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = add(b1, b2)
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    override def outputEncoder: Encoder[Array[Long]] = longArrayEnc

    private def add(b: Array[Long], a: Array[Long]): Array[Long] =
      if (a == null || a.isEmpty) b
      else if (b.isEmpty) a.clone()
      else {
        require(a.length == b.length,
          s"vector_sum: mixed dimensions ${b.length} vs ${a.length}")
        var i = 0
        while (i < b.length) { b(i) = Math.addExact(b(i), a(i)); i += 1 }
        b
      }
  }

  private object LongVectorSquareSum extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    // buffer/result layout: [hi0, lo0, hi1, lo1, …] with 0 <= lo < 1e18
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], a: Array[Long]): Array[Long] = {
      if (a == null || a.isEmpty) return b
      val out = if (b.isEmpty) new Array[Long](2 * a.length) else b
      require(out.length == 2 * a.length,
        s"vector_sum_sq: mixed dimensions ${out.length / 2} vs ${a.length}")
      var i = 0
      while (i < a.length) {
        // Fold sq into the limb pair BEFORE adding: sq alone can reach
        // ~9.22e18, so lo + sq overflows Long for |x| in (2.87, 3.04].
        // Splitting first keeps every intermediate < 2e18.
        val sq = Math.multiplyExact(a(i), a(i))
        var lo = out(2 * i + 1) + (sq % LIMB) // both < 1e18 => safe
        var hi = Math.addExact(out(2 * i), sq / LIMB)
        if (lo >= LIMB) { hi = Math.addExact(hi, 1L); lo -= LIMB }
        out(2 * i) = hi
        out(2 * i + 1) = lo
        i += 1
      }
      out
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
      if (b2.isEmpty) b1
      else if (b1.isEmpty) b2
      else {
        var i = 0
        while (i < b1.length / 2) {
          var lo = b1(2 * i + 1) + b2(2 * i + 1)
          var hi = Math.addExact(b1(2 * i), b2(2 * i))
          if (lo >= LIMB) { hi = Math.addExact(hi, 1L); lo -= LIMB }
          b1(2 * i) = hi
          b1(2 * i + 1) = lo
          i += 1
        }
        b1
      }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    override def outputEncoder: Encoder[Array[Long]] = longArrayEnc
  }

  private implicit val doubleArrayEnc: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()

  private object DoubleVectorMax extends Aggregator[Array[Double], Array[Double], Array[Double]] {
    override def zero: Array[Double] = Array.emptyDoubleArray
    override def reduce(b: Array[Double], a: Array[Double]): Array[Double] = mx(b, a)
    override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = mx(b1, b2)
    override def finish(r: Array[Double]): Array[Double] = r
    override def bufferEncoder: Encoder[Array[Double]] = doubleArrayEnc
    override def outputEncoder: Encoder[Array[Double]] = doubleArrayEnc

    private def mx(b: Array[Double], a: Array[Double]): Array[Double] =
      if (a == null || a.isEmpty) b
      else if (b.isEmpty) a.clone()
      else {
        require(a.length == b.length,
          s"vector_max: mixed dimensions ${b.length} vs ${a.length}")
        var i = 0
        // Total ordering (NaN greatest, like Spark's max) so the result
        // is partitioning-independent even with NaN inputs.
        while (i < b.length) {
          if (java.lang.Double.compare(a(i), b(i)) > 0) b(i) = a(i)
          i += 1
        }
        b
      }
  }

  /** Exact element-wise sum of an `array<long>` column. */
  val sumLong: Column => Column = udaf(LongVectorSum).apply(_)

  /** Element-wise max of an `array<double>` column (max is associative and
    * exact — partitioning-independent like the sums). */
  val maxDouble: Column => Column = udaf(DoubleVectorMax).apply(_)

  /** Exact element-wise sum of SQUARES of an `array<long>` column, as
    * base-1e18 limb pairs — decode with [[squaresToDecimal]]. */
  val sumSquares: Column => Column = udaf(LongVectorSquareSum).apply(_)

  /** The micro-grid quantizer as a whole-vector transform: 1e-9 fixed
    * point via sign(x)·floor(|x|·1e9) — the exact convention of the
    * exploded plans this aggregator replaces. */
  def quantizeNano(v: Column): Column =
    transform(v, x => (signum(x) * floor(abs(x) * lit(1e9))).cast("long"))

  /** The centroid recompute as one whole-vector aggregation: mean vector
    * per `keyCol` on the 1e-9 micro-grid — exact long sums, one double
    * divide per component, bit-identical under any partitioning. Returns
    * (key, cvec). The shape every Lloyd-style recompute (IVF, PQ
    * codebooks, label centroids) shares. */
  def sumCentroids(
      df: org.apache.spark.sql.DataFrame, keyCol: Column, vecCol: Column): org.apache.spark.sql.DataFrame =
    df.select(keyCol.as("__k"), quantizeNano(vecCol).as("__q"))
      .groupBy(col("__k"))
      .agg(sumLong(col("__q")).as("__sv"), count(lit(1)).as("__n"))
      .select(
        col("__k").as(keyCol.toString),
        transform(col("__sv"), s => s.cast("double") / (col("__n") * lit(1e9))).as("cvec"))

  /** Reassemble [[sumSquares]]'s limb pair for component `pos` (0-based)
    * into the DECIMAL(38,0) the oracle sums: hi·1e18 + lo, exact. */
  def squaresToDecimal(limbs: Column, pos: Column): Column = {
    val hi = element_at(limbs, (pos * 2 + 1).cast("int")).cast("decimal(38,0)")
    val lo = element_at(limbs, (pos * 2 + 2).cast("int")).cast("decimal(38,0)")
    hi * lit(LIMB).cast("decimal(19,0)") + lo
  }
}
