package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class OutliersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a planted anti-aligned vector is the flagged outlier") {
    // 11 tight vectors around e1 plus one pointing the other way.
    val tight = (0L until 11L).map { i =>
      (i, Array(1.0f, 0.01f * i, 0.0f), "g")
    }
    val planted = Seq((99L, Array(-1.0f, 0.5f, 0.0f), "g"))
    val emb = (tight ++ planted).toDF("vec_id", "embedding", "label")
    val out = Outliers
      .cosineOutliers(emb, col("vec_id"), col("embedding"), col("label"))
      .as[(Long, String, Double, Option[Double], Boolean)]
      .collect()
      .map(r => r._1 -> r)
      .toMap
    assert(out(99L)._5, s"planted outlier not flagged: ${out(99L)}")
    assert(out.filterNot(_._1 == 99L).values.forall(!_._5), "tight cluster falsely flagged")
  }

  test("singleton groups get null z and are never flagged") {
    val emb = Seq((1L, Array(1.0f, 0.0f), "solo")).toDF("vec_id", "embedding", "label")
    val out = Outliers
      .cosineOutliers(emb, col("vec_id"), col("embedding"), col("label"))
      .as[(Long, String, Double, Option[Double], Boolean)]
      .collect()
    assert(out.length === 1 && out(0)._4.isEmpty && !out(0)._5)
  }

  test("flags and z-scores are partitioning-independent (exact moment sums)") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    def run(df: org.apache.spark.sql.DataFrame) = Outliers
      .cosineOutliers(df, col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Int, Double, Option[Double], Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(run(emb) === run(emb.repartition(13)))
  }
}
