package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) key: interleave the low 31 bits of two BIGINT columns
  * into one 62-bit BIGINT — `x` on even bit positions, `y` on odd. Rows
  * sorted by the result cluster in BOTH dimensions at once, which is what
  * makes multi-column file skipping work: range-partition + sort a table
  * by its Z-key ([[graft.sources.Sinks.writeClustered]]) and every parquet
  * file covers a small rectangle of (x, y) space, so min/max footer stats
  * prune files for predicates on EITHER column — the clustered-table /
  * Z-ordering technique of modern lakehouse engines, built from plain
  * Spark primitives.
  *
  * Implementation is the standard mask-and-shift bit spread (5 steps per
  * operand, branch-free) fused into one codegen expression — no lambda
  * frames, no allocation, stays inside whole-stage codegen. 31 bits per
  * operand keeps the result positive on every engine (bit 63 never set),
  * so signed BIGINT comparisons order identically to the unsigned Morton
  * order; inputs are masked, so callers pre-scale values into [0, 2³¹)
  * (rank or min-max normalize — resolution beyond ~2 billion buckets per
  * dimension adds nothing to file skipping). Null in → null out.
  *
  * The same arithmetic is expressible in ANSI SQL (`&`, `|`, `<<` on
  * BIGINT) — [[InterleaveBitsExpression.oracleSql]] generates the
  * equivalent expression for the DuckDB oracle.
  */
case class InterleaveBitsExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean  = true
  override def prettyName: String = "graft_interleave_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two BIGINT inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBitsExpression.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = InterleaveBitsExpression.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$cls.interleave($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): InterleaveBitsExpression = copy(left = newLeft, right = newRight)
}

object InterleaveBitsExpression {

  /** Spread the low 31 bits of `v` onto even bit positions (0,2,…,60). */
  def spread(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton key of (x, y): x on even bits, y on odd. Called from both the
    * interpreted path and the generated code (one shared definition — the
    * two paths cannot drift). */
  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  /** ANSI-SQL twin of [[interleave]] for a DuckDB oracle: the same
    * mask-and-shift pipeline over the given column expressions (decimal
    * literals — hex literals are not portable). */
  def oracleSql(xCol: String, yCol: String): String = {
    def spreadSql(c: String): String = {
      val m = Seq(
        (16, 281470681808895L),     // 0x0000FFFF0000FFFF
        (8, 71777214294589695L),    // 0x00FF00FF00FF00FF
        (4, 1085102592571150095L),  // 0x0F0F0F0F0F0F0F0F
        (2, 3689348814741910323L),  // 0x3333333333333333
        (1, 6148914691236517205L)   // 0x5555555555555555
      )
      m.foldLeft(s"($c & 2147483647)") { case (acc, (sh, mask)) =>
        s"(($acc | ($acc << $sh)) & $mask)"
      }
    }
    s"(${spreadSql(xCol)} | (${spreadSql(yCol)} << 1))"
  }
}
