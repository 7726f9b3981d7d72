package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native cosine similarity over two `array<double>` columns (SURVEY.md
  * §4.3-style justified custom expression): the `zip_with`+`aggregate`
  * formulation in [[graft.functions.VectorOps]] is correct but Catalyst
  * higher-order functions execute their lambdas interpreted, allocating a
  * lambda frame per element — at 100 TB the similarity scorer is the
  * innermost loop of dedup and ANN search. This expression runs the fused
  * dot/norm/norm loop in generated Java (or a tight JVM loop on the
  * interpreted path).
  *
  * Numerics: accumulates dot, |a|², |b|² in index order — bit-identical to
  * the HOF formulation (asserted in CosineExpressionSpec), so oracle
  * results are unchanged when swapped in.
  *
  * Null semantics match the HOF version: null array, length mismatch, or
  * any null element → null.
  */
case class CosineSimilarityExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def prettyName: String = "graft_cosine"

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
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
      val x = arrA.getDouble(i); val y = arrB.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val i   = ctx.freshName("i")
        val n   = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na  = ctx.freshName("na")
        val nb  = ctx.freshName("nb")
        val x   = ctx.freshName("x")
        val y   = ctx.freshName("y")
        s"""
          final int $n = $a.numElements();
          if ($n != $b.numElements()) {
            ${ev.isNull} = true;
          } else {
            double $dot = 0.0, $na = 0.0, $nb = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
              final double $x = $a.getDouble($i);
              final double $y = $b.getDouble($i);
              $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
            }
            if (!${ev.isNull}) {
              ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
            }
          }
        """
      }
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): CosineSimilarityExpression = copy(left = newLeft, right = newRight)
}
