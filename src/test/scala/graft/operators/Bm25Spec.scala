package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "rare common filler filler filler"),   // rare term once, short doc
    (2L, "common filler filler filler filler filler filler common"),
    (3L, "common filler other words here"),
    (4L, "nothing matching at all")
  ).toDF("doc_id", "text")

  test("idf ranks the rare-term doc first; non-matching docs are absent") {
    val out = Bm25
      .score(corpus, col("doc_id"), col("text"), Seq("rare", "common"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .as[(Long, Long, Double)].collect().toList
    assert(out.map(_._1).toSet === Set(1L, 2L, 3L), s"match set wrong: $out")
    assert(out.head._1 === 1L, s"rare-term doc must outrank common-only docs: $out")
    assert(out.head._2 === 2L, "doc 1 matches both query terms")
    assert(out.forall(_._3 > 0.0))
  }

  test("scores are independent of input partitioning (micro-unit sums)") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val a = Bm25.score(docs, col("doc_id"), col("text"), Seq("scan", "hash", "dup"))
      .as[(Long, Long, Double)].collect().sorted.toSeq
    val b = Bm25.score(docs.repartition(11), col("doc_id"), col("text"), Seq("scan", "hash", "dup"))
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(a === b)
  }
}
