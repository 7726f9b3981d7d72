package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 3-dimensional Morton (Z-order) key — [[InterleaveBitsExpression]]
  * extended to the three-column clustering real lakehouse tables use
  * (e.g. (date, customer, product)): the low 20 bits of each BIGINT input
  * round-robin onto bit positions `3·b + dim`, giving a 60-bit key whose
  * sort order clusters all three dimensions at once. Files written
  * range-partitioned + sorted by it cover small BOXES of (x, y, z) space,
  * so parquet min/max stats prune on ANY of the three columns
  * ([[graft.sources.Sinks.writeClusteredK]] is the write path; the 3-D
  * skipping contrast vs a 1-D sort is asserted in SinksSpec).
  *
  * 20 bits per dimension (vs 31 at k=2) is the k-ary resolution trade —
  * ~10⁶ buckets per dimension, far beyond what file-grain skipping can
  * exploit. Inputs are masked; callers pre-scale into [0, 2²⁰)
  * ([[graft.functions.ZOrder.scaleToBits]] with bits ≤ 20). Bit 63 is
  * never set, so signed comparisons order identically to unsigned Morton
  * order. Null in → null out. The generic bit loop is a shared static
  * helper called from both the interpreted path and the generated code
  * (the two paths cannot drift); [[Morton3Expression.oracleSql]] emits
  * the ANSI-SQL twin for the DuckDB oracle.
  */
case class Morton3Expression(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean  = true
  override def prettyName: String = "graft_morton3"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires three BIGINT inputs, got " +
          children.map(_.dataType.catalogString).mkString(", "))

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    Morton3Expression.interleave3(
      a.asInstanceOf[Long], b.asInstanceOf[Long], c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Morton3Expression.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b, c) => s"$cls.interleave3($a, $b, $c)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression): Morton3Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object Morton3Expression {

  val BitsPerDim = 20

  /** Spread the low 20 bits of `v` onto positions `3·b + dim`. */
  def spread3(v: Long, dim: Int): Long = {
    var out = 0L
    var b   = 0
    val x   = v & ((1L << BitsPerDim) - 1)
    while (b < BitsPerDim) {
      out |= ((x >> b) & 1L) << (3 * b + dim)
      b += 1
    }
    out
  }

  /** Morton key of (x, y, z): x on positions ≡0 (mod 3), y ≡1, z ≡2. */
  def interleave3(x: Long, y: Long, z: Long): Long =
    spread3(x, 0) | spread3(y, 1) | spread3(z, 2)

  /** ANSI-SQL twin of [[interleave3]] for a DuckDB oracle: the literal
    * 60-term shift-and-or expansion (no portable loop construct exists). */
  def oracleSql(xCol: String, yCol: String, zCol: String): String = {
    def terms(c: String, dim: Int): Seq[String] =
      (0 until BitsPerDim).map(b => s"((($c >> $b) & 1) << ${3 * b + dim})")
    (terms(xCol, 0) ++ terms(yCol, 1) ++ terms(zCol, 2)).mkString("(", " | ", ")")
  }
}
