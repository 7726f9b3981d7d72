package graft.pipelines

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusPrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup
    (3L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near dup
    (4L, "completely different document about distributed query engines and shuffles today"),
    (5L, "tiny"),                                                               // too short
    (6L, "the a of and to in is it that for the a of and to in")               // all stopwords
  ).toDF("doc_id", "text")

  test("pipeline drops exact dups, near dups, short and low-quality docs") {
    val cfg = CorpusPrep.Config(
      minhash = graft.operators.Dedup
        .MinHashParams(numHashes = 32, numBands = 16, jaccardThreshold = 0.5),
      minTokens = 3,
      maxStopwordRatio = 0.8
    )
    val (out, audit) = CorpusPrep.prepare(corpus, col("doc_id"), col("text"), cfg)
    val ids = out.select("doc_id").as[Long].collect().sorted
    assert(ids === Array(1L, 4L)) // 2 exact-dup, 3 near-dup, 5 short, 6 stopword soup
    val counts = audit.collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(counts === Map("input" -> 6L, "exact_dedup" -> 5L, "near_dedup" -> 4L, "gated" -> 2L))
    // enrichment columns present and populated
    val row = out.filter(col("doc_id") === 1).collect().head
    assert(row.getAs[Long]("n_tok") > 0 && row.getAs[Long]("fp") >= 0)
  }

  test("pipeline is idempotent on its own output") {
    val cfg = CorpusPrep.Config(minTokens = 3, maxStopwordRatio = 0.8)
    val (once, _)  = CorpusPrep.prepare(corpus, col("doc_id"), col("text"), cfg)
    val (twice, _) = CorpusPrep.prepare(once.select("doc_id", "text"), col("doc_id"), col("text"), cfg)
    assert(once.select("doc_id").as[Long].collect().sorted ===
      twice.select("doc_id").as[Long].collect().sorted)
  }
}
