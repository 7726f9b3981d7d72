package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class VocabSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "a a a b b c"),
    (2L, "a b d"),
    (3L, "a c c")
  ).toDF("doc_id", "text")

  test("build ranks by count desc then token; coverage accumulates to 1") {
    val v = Vocab.build(corpus, col("text"), 10).as[(Long, String, Long, Double)].collect().toList
    // counts: a=5, b=3, c=3, d=1 (total 12); b before c on the tie by token.
    assert(v.map(r => (r._1, r._2, r._3)) === List((1L, "a", 5L), (2L, "b", 3L), (3L, "c", 3L), (4L, "d", 1L)))
    assert(v.last._4 === 1.0)
    assert(v.map(_._4) === v.map(_._4).sorted, "coverage curve must be nondecreasing")
  }

  test("truncated vocab encodes OOV as UNK=0 and preserves token order") {
    val v = Vocab.build(corpus, col("text"), 2) // keeps a, b only
    val e = Vocab
      .encode(corpus, col("doc_id"), col("text"), v)
      .as[(Long, Long, Long, Seq[Long])]
      .collect()
      .sortBy(_._1)
      .toList
    assert(e === List(
      (1L, 6L, 1L, Seq(1L, 1L, 1L, 2L, 2L, 0L)),
      (2L, 3L, 1L, Seq(1L, 2L, 0L)),
      (3L, 3L, 2L, Seq(1L, 0L, 0L))))
  }

  test("encode keeps zero-token documents as (doc_id, 0, 0, [])") {
    // The every-input-doc contract of the sibling passes (LmScore keeps
    // empty docs via explode_outer): a whitespace-only or empty text must
    // not vanish from the encoded corpus.
    val withEmpty = corpus.unionByName(Seq((4L, ""), (5L, "   ")).toDF("doc_id", "text"))
    val v = Vocab.build(corpus, col("text"), 2)
    val e = Vocab.encode(withEmpty, col("doc_id"), col("text"), v)
      .as[(Long, Long, Long, Seq[Long])].collect().sortBy(_._1).toList
    assert(e.map(_._1) === List(1L, 2L, 3L, 4L, 5L))
    assert(e.filter(_._1 >= 4L) === List((4L, 0L, 0L, Seq()), (5L, 0L, 0L, Seq())))
  }

  test("encode is partitioning-stable (position-sorted re-assembly)") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val v = Vocab.build(docs, col("text"), 50)
    val a = Vocab.encode(docs, col("doc_id"), col("text"), v)
      .as[(Long, Long, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val b = Vocab.encode(docs.repartition(13), col("doc_id"), col("text"), v)
      .as[(Long, Long, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(a === b)
  }
}
