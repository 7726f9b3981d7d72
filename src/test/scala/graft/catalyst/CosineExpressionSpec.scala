package graft.catalyst

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorOps

class CosineExpressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native cosine is bit-identical to the HOF formulation on the fixture corpus") {
    GraftExtensions.register(spark)
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val a = emb.select(col("vec_id").as("id_a"), VectorOps.asDouble(col("embedding")).as("v_a"))
    val b = emb.select(col("vec_id").as("id_b"), VectorOps.asDouble(col("embedding")).as("v_b"))
    val pairs = a.join(b, col("id_b") === col("id_a") + 7)
    val rows = pairs.select(
      VectorOps.cosine(col("v_a"), col("v_b")).as("hof"),
      call_function("graft_cosine", col("v_a"), col("v_b")).as("native")
    ).collect()
    assert(rows.length > 400)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("native l2 distance is bit-identical to the HOF formulation; nulls match") {
    GraftExtensions.register(spark)
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val a = emb.select(col("vec_id").as("id_a"), VectorOps.asDouble(col("embedding")).as("v_a"))
    val b = emb.select(col("vec_id").as("id_b"), VectorOps.asDouble(col("embedding")).as("v_b"))
    val rows = a.join(b, col("id_b") === col("id_a") + 7).select(
      sqrt(aggregate(
        zip_with(col("v_a"), col("v_b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, d) => acc + d)).as("hof"),
      call_function("graft_l2dist", col("v_a"), col("v_b")).as("native")
    ).collect()
    assert(rows.length > 400)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
    val nulls = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0, 3.0))), // length mismatch
      (None, Some(Seq(1.0, 2.0)))                      // null array
    ).toDF("a", "b")
    val out = nulls.select(call_function("graft_l2dist", col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0))
    // interpreted eval agrees with the reference formula
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val la = Literal.create(ArrayData.toArrayData(Array(1.0, 2.0, 3.0)), ArrayType(DoubleType))
    val lb = Literal.create(ArrayData.toArrayData(Array(-1.0, 0.5, 2.0)), ArrayType(DoubleType))
    val interp = L2DistanceExpression(la, lb).eval(null).asInstanceOf[Double]
    assert(math.abs(interp - math.sqrt(4.0 + 2.25 + 1.0)) < 1e-15)
  }

  test("CosineFusionRule rewrites the HOF cosine pattern to the native expression") {
    GraftExtensions.register(spark)
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val df = emb.select(
      col("vec_id"),
      VectorOps.cosine(
        VectorOps.asDouble(col("embedding")),
        VectorOps.asDouble(reverse(col("embedding")))
      ).as("c")
    )
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_cosine"), s"fusion did not fire:\n${optimized.take(1500)}")
    assert(!optimized.contains("aggregate(zip_with"), "HOF pattern survived the rewrite")
    // the rewrite preserves values exactly (vs a session-independent recompute)
    val viaRule = df.orderBy("vec_id").select("c").collect().map(_.getDouble(0))
    val viaNative = emb.select(
      col("vec_id"),
      call_function("graft_cosine",
        VectorOps.asDouble(col("embedding")),
        VectorOps.asDouble(reverse(col("embedding")))).as("c")
    ).orderBy("vec_id").select("c").collect().map(_.getDouble(0))
    assert(viaRule.toSeq === viaNative.toSeq)
  }

  test("fusion rule binds lambda variables: x*x / v+v shapes are NOT rewritten") {
    GraftExtensions.register(spark)
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet").limit(20)
    val a = VectorOps.asDouble(col("embedding"))
    val b = VectorOps.asDouble(reverse(col("embedding")))
    // same tree shape as cosine but the lambdas compute x*x and v+v —
    // a rewrite would silently change results (ADVICE round 2).
    val squareNotDot = aggregate(zip_with(a, b, (x, _) => x * x), lit(0.0), (acc, v) => acc + v)
    val doubleNotSum = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (_, v) => v + v)
    for ((body, tag) <- Seq((squareNotDot, "x*x"), (doubleNotSum, "v+v"))) {
      val df = emb.select((body / (VectorOps.l2Norm(a) * VectorOps.l2Norm(b))).as("c"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("graft_cosine"), s"$tag was wrongly fused to cosine")
    }
    // and the legit pattern still fuses with the stricter matcher
    val legit = emb.select(VectorOps.cosine(a, b).as("c"))
    assert(legit.queryExecution.optimizedPlan.toString.contains("graft_cosine"),
      "strict binding broke the positive case")
  }

  test("fusion rule leaves non-cosine dot products alone") {
    GraftExtensions.register(spark)
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet").limit(5)
    val df = emb.select(
      VectorOps.dot(
        VectorOps.asDouble(col("embedding")),
        VectorOps.asDouble(col("embedding"))
      ).as("d")
    )
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_cosine"))
    assert(df.collect().forall(_.getDouble(0) > 0.0))
  }

  test("null semantics: null array / length mismatch / null element → null") {
    GraftExtensions.register(spark)
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0, 3.0))),  // length mismatch
      (None, Some(Seq(1.0, 2.0))),                      // null array
      (Some(Seq(1.0, Double.NaN)), Some(Seq(1.0, 2.0))) // NaN passes through (not null)
    ).toDF("a", "b")
    val out = df.select(call_function("graft_cosine", col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0).isNaN)
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val a = Literal.create(ArrayData.toArrayData(Array(1.0, 2.0, 3.0)), ArrayType(DoubleType))
    val b = Literal.create(ArrayData.toArrayData(Array(-1.0, 0.5, 2.0)), ArrayType(DoubleType))
    val interp = CosineSimilarityExpression(a, b).eval(null).asInstanceOf[Double]
    val expected = {
      val (x, y) = (Array(1.0, 2.0, 3.0), Array(-1.0, 0.5, 2.0))
      val dot = x.zip(y).map { case (p, q) => p * q }.sum
      dot / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
    }
    assert(math.abs(interp - expected) < 1e-15)
  }
}
