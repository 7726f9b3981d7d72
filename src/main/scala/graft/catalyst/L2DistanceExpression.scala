package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native euclidean distance over two `array<double>` columns — the
  * [[CosineSimilarityExpression]] treatment applied to the L2 metric:
  * `sqrt(aggregate(zip_with(a, b, (x,y) => (x−y)²), 0.0, _+_))` is the
  * innermost loop of centroid scoring (silhouette, k-means assignment,
  * drift checks), and Catalyst executes HOF lambdas interpreted with a
  * frame per element. This runs the fused subtract/square/accumulate loop
  * in generated Java.
  *
  * Numerics: accumulates (x−y)² in index order then takes one sqrt —
  * bit-identical to the HOF formulation (asserted in CosineExpressionSpec
  * alongside the cosine law), so oracle results are unchanged when
  * swapped in.
  *
  * Null semantics match the HOF version: null array, length mismatch, or
  * any null element → null.
  */
case class L2DistanceExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def prettyName: String = "graft_l2dist"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<DOUBLE> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}"
      )
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    val n    = arrA.numElements()
    if (n != arrB.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
      val d = arrA.getDouble(i) - arrB.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val i   = ctx.freshName("i")
        val n   = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val d   = ctx.freshName("d")
        s"""
          final int $n = $a.numElements();
          if ($n != $b.numElements()) {
            ${ev.isNull} = true;
          } else {
            double $acc = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
              final double $d = $a.getDouble($i) - $b.getDouble($i);
              $acc += $d * $d;
            }
            if (!${ev.isNull}) {
              ${ev.value} = java.lang.Math.sqrt($acc);
            }
          }
        """
      }
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): L2DistanceExpression = copy(left = newLeft, right = newRight)
}
