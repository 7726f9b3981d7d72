package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native MinHash-signature agreement over two `array<bigint>` columns:
  * the fraction of equal slots — the sketch-estimated Jaccard used by the
  * incremental dedup verify join
  * ([[graft.pipelines.CorpusPrep.prepareIncremental]]) and the
  * source-overlap query. Same justification as
  * [[CosineSimilarityExpression]]: the `zip_with`+`aggregate` formulation
  * (`MinHashSketch.estimateJaccardCol`) is correct but HOF lambdas run
  * interpreted, and at 100 TB this comparison is the inner loop of every
  * candidate pair the LSH band join emits. Bit-equality with the HOF form
  * is asserted in MinHashSketchSpec.
  *
  * Semantics (matching the HOF form on the equal-length inputs every
  * caller produces): null array → null; a null ELEMENT counts as
  * disagreement; length mismatch → null (the HOF form zip-pads instead,
  * but no caller compares signatures of different families — failing
  * loudly beats silently averaging over the longer length).
  */
case class SigAgreementExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def prettyName: String = "graft_sig_agreement"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<BIGINT> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}"
      )
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    val n    = arrA.numElements()
    if (n != arrB.numElements() || n == 0) return null
    var agree = 0
    var i     = 0
    while (i < n) {
      if (!arrA.isNullAt(i) && !arrB.isNullAt(i) && arrA.getLong(i) == arrB.getLong(i))
        agree += 1
      i += 1
    }
    agree.toDouble / n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val i     = ctx.freshName("i")
        val n     = ctx.freshName("n")
        val agree = ctx.freshName("agree")
        s"""
          final int $n = $a.numElements();
          if ($n != $b.numElements() || $n == 0) {
            ${ev.isNull} = true;
          } else {
            int $agree = 0;
            for (int $i = 0; $i < $n; $i++) {
              if (!$a.isNullAt($i) && !$b.isNullAt($i) && $a.getLong($i) == $b.getLong($i)) {
                $agree++;
              }
            }
            ${ev.value} = ((double) $agree) / $n;
          }
        """
      }
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): SigAgreementExpression = copy(left = newLeft, right = newRight)
}
