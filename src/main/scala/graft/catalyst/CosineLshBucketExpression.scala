package graft.catalyst

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH bucket for cosine similarity over an
  * `array<double>` column: `nbits` signed projections against
  * deterministic pseudo-random ±1 hyperplanes, packed into a long
  * (bit b of the bucket = sign of vec · h_b, b=0 most significant).
  *
  * Why a native expression (SURVEY.md §4.3 bar): the declarative form in
  * [[graft.operators.SimilarityJoin.cosineLshBucket]] used to inline a
  * dim×nbits literal sign matrix — at production embedding dims
  * (1024–4096) that is a 10⁵-node expression tree that blows past the
  * codegen method-size limit and falls back to interpreted eval exactly on
  * the D9 hot path (VERDICT r4 §wrong-1). Here the sign matrix is
  * PRECOMPUTED ONCE per executor (a `dim·nbits` double[] shipped via the
  * codegen references array, O(1) generated-code size) and the per-row work
  * is a fused nbits×dim multiply-add loop with zero per-row hashing.
  *
  * Bucket values are bit-identical to the old Column form (asserted in
  * SimilaritySpec): sign h_b[i] = +1 iff xxhash64(int32 b·131071 + i) is
  * even — the same `XXH64.hashInt(seed=42)` Spark's `xxhash64` applies to
  * an INT literal — and the dot product accumulates in index order exactly
  * like `aggregate(zip_with(...))`. Degenerate inputs keep the old
  * semantics too: a null vector, a length ≠ dim, or any null element made
  * every per-bit sum NULL, which the old `when(dotSign >= 0, 1).otherwise(0)`
  * mapped to bit 0 — so those rows land in bucket 0, never NULL.
  */
case class CosineLshBucketExpression(child: Expression, dim: Int, nbits: Int)
    extends UnaryExpression {
  require(dim >= 1, "dim must be >= 1")
  require(nbits >= 1 && nbits <= 64, "nbits must be in [1, 64]")

  override def dataType: DataType = LongType
  override def nullable: Boolean  = false
  override def prettyName: String = "graft_lsh_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an ARRAY<DOUBLE> input, got ${other.catalogString}")
  }

  // Row-major [b*dim + i] sign matrix; recomputed lazily per executor
  // (never serialized with the expression — the codegen path ships it via
  // addReferenceObj, the interpreted path rebuilds it from (dim, nbits)).
  @transient private lazy val signs: Array[Double] = {
    val m = new Array[Double](nbits * dim)
    var b = 0
    while (b < nbits) {
      var i = 0
      while (i < dim) {
        m(b * dim + i) = if (XXH64.hashInt(b * 131071 + i, 42L) % 2 == 0) 1.0 else -1.0
        i += 1
      }
      b += 1
    }
    m
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return 0L
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return 0L
      i += 1
    }
    var bucket = 0L
    var b      = 0
    while (b < nbits) {
      var dot = 0.0
      val off = b * dim
      i = 0
      while (i < dim) {
        dot += arr.getDouble(i) * signs(off + i)
        i += 1
      }
      bucket = (bucket << 1) | (if (dot >= 0.0) 1L else 0L)
      b += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val signsRef = ctx.addReferenceObj("lshSigns", signs, "double[]")
    val arr      = ctx.freshName("arr")
    val ok       = ctx.freshName("ok")
    val b        = ctx.freshName("b")
    val i        = ctx.freshName("i")
    val dot      = ctx.freshName("dot")
    val off      = ctx.freshName("off")
    val resultCode =
      s"""
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $arr = ${childGen.value};
          boolean $ok = $arr.numElements() == $dim;
          for (int $i = 0; $ok && $i < $dim; $i++) {
            if ($arr.isNullAt($i)) $ok = false;
          }
          if ($ok) {
            for (int $b = 0; $b < $nbits; $b++) {
              double $dot = 0.0;
              final int $off = $b * $dim;
              for (int $i = 0; $i < $dim; $i++) {
                $dot += $arr.getDouble($i) * $signsRef[$off + $i];
              }
              ${ev.value} = (${ev.value} << 1) | ($dot >= 0.0 ? 1L : 0L);
            }
          }
        }
      """
    ev.copy(code = childGen.code + code"$resultCode", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CosineLshBucketExpression =
    copy(child = newChild)
}
