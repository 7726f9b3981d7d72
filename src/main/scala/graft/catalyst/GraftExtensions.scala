package graft.catalyst

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions for the engine's native Catalyst pieces. Activate
  * with `spark.sql.extensions=graft.catalyst.GraftExtensions`, or call
  * [[GraftExtensions.register]] on an already-built session (the driver
  * harness builds its own sessions, so query code uses the latter).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.gunzipDescriptor)
    ext.injectFunction(GraftExtensions.cosineDescriptor)
    ext.injectFunction(GraftExtensions.sigAgreementDescriptor)
    ext.injectFunction(GraftExtensions.lshBucketDescriptor)
    ext.injectFunction(GraftExtensions.interleaveBitsDescriptor)
    ext.injectOptimizerRule(_ => CosineFusionRule)
  }
}

object GraftExtensions {

  private[catalyst] val gunzipDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_gunzip"),
    new ExpressionInfo(
      classOf[GunzipExpression].getName,
      null,
      "graft_gunzip",
      "graft_gunzip(payload) - gunzip a BINARY column; malformed input yields NULL.",
      ""
    ),
    (children: Seq[Expression]) => GunzipExpression(children.head)
  )

  private[catalyst] val cosineDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(
      classOf[CosineSimilarityExpression].getName,
      null,
      "graft_cosine",
      "graft_cosine(a, b) - cosine similarity of two ARRAY<DOUBLE> vectors (fused codegen loop).",
      ""
    ),
    (children: Seq[Expression]) => CosineSimilarityExpression(children.head, children(1))
  )

  private[catalyst] val sigAgreementDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sig_agreement"),
    new ExpressionInfo(
      classOf[SigAgreementExpression].getName,
      null,
      "graft_sig_agreement",
      "graft_sig_agreement(a, b) - fraction of equal slots of two ARRAY<BIGINT> MinHash signatures (fused codegen loop).",
      ""
    ),
    (children: Seq[Expression]) => SigAgreementExpression(children.head, children(1))
  )

  private[catalyst] val lshBucketDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_lsh_bucket"),
    new ExpressionInfo(
      classOf[CosineLshBucketExpression].getName,
      null,
      "graft_lsh_bucket",
      "graft_lsh_bucket(vec, dim, nbits) - random-hyperplane cosine-LSH bucket of an " +
        "ARRAY<DOUBLE> vector as a BIGINT (fused codegen loop over a precomputed sign matrix).",
      ""
    ),
    (children: Seq[Expression]) => {
      def intLit(e: Expression, name: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
        case other =>
          throw new IllegalArgumentException(
            s"graft_lsh_bucket: $name must be an INT literal, got $other")
      }
      CosineLshBucketExpression(
        children.head,
        intLit(children(1), "dim"),
        intLit(children(2), "nbits"))
    }
  )

  private[catalyst] val interleaveBitsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_interleave_bits"),
    new ExpressionInfo(
      classOf[InterleaveBitsExpression].getName,
      null,
      "graft_interleave_bits",
      "graft_interleave_bits(x, y) - Morton (Z-order) key: interleave the low 31 bits of " +
        "two BIGINTs, x on even positions, y on odd (branch-free codegen).",
      ""
    ),
    (children: Seq[Expression]) => InterleaveBitsExpression(children.head, children(1))
  )

  /** Idempotently register the native functions and the fusion rule on an
    * existing session (sessions built with `spark.sql.extensions` get both
    * through [[GraftExtensions]] instead). */
  def register(spark: SparkSession): Unit = {
    Seq(gunzipDescriptor, cosineDescriptor, sigAgreementDescriptor, lshBucketDescriptor,
        interleaveBitsDescriptor)
      .foreach { case (ident, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(ident)) {
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
      }
    }
    if (!spark.experimental.extraOptimizations.contains(CosineFusionRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CosineFusionRule
    }
  }
}
