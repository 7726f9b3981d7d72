package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BloomDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = graft.tables.Tables.documents(spark, TestSpark.sf0001)
  private def corpus = docs.filter(col("doc_id") % 2 === 0)
  private def shard = docs.filter(col("doc_id") % 5 === 0)

  // Deliberately undersized sketch so false positives actually occur and
  // the laws bite (the registered query uses production-sized params).
  private val tight = BloomDedup.Params(estItems = 64, numBits = 256)

  test("newRows ≡ exact anti-join, even with a saturated sketch") {
    for (p <- Seq(BloomDedup.Params(), tight)) {
      val got = BloomDedup
        .newRows(corpus, shard, col("text"), col("text"), p)
        .select(col("doc_id")).as[Long].collect().sorted
      val want = shard
        .join(corpus.select(col("text").as("__t")), col("text") === col("__t"), "left_anti")
        .select(col("doc_id")).as[Long].collect().sorted
      assert(got === want, s"params $p")
      assert(want.nonEmpty && want.length < shard.count(), "fixture split lost its overlap")
    }
  }

  test("no false negatives: every true duplicate is flagged a candidate") {
    val sketch = BloomDedup.buildBroadcast(corpus, col("text"), tight)
    val missedDup = shard
      .filter(!BloomDedup.mightContain(sketch, col("text")))
      .join(corpus.select(col("text").as("__t")), col("text") === col("__t"), "left_semi")
      .count()
    assert(missedDup === 0L)
  }

  test("auditStats partitions the shard and bounds the fp rate") {
    val row = BloomDedup
      .auditStats(corpus, shard, col("text"), col("text"))
      .as[(Long, Long, Long, Long, Long, Double)]
      .collect()
      .head
    val (total, defNew, cand, dups, fps, fpRate) = row
    assert(defNew + cand === total)
    assert(cand >= dups, "a dup escaped the candidate set (false negative)")
    assert(fps === cand - dups)
    assert(dups > 0L, "fixture split lost its overlap")
    // Production-sized sketch on fixture data: essentially zero fp.
    assert(fpRate <= 0.01, s"fp rate $fpRate")
  }

  test("the sketch is incrementally maintainable: union-built probe has no false negatives") {
    val a = docs.filter(col("doc_id") % 3 === 0)
    val b = docs.filter(col("doc_id") % 3 === 1)
    val sketch = BloomDedup.buildBroadcast(a.unionByName(b), col("text"), tight)
    val missed = a.unionByName(b)
      .filter(!BloomDedup.mightContain(sketch, col("text")))
      .count()
    assert(missed === 0L)
  }

  test("empty-corpus bootstrap: newRows passes the whole shard through") {
    // First shard ever: BloomFilterAggregate evals to NULL on an empty
    // corpus; the broadcast maps that to an all-zero filter, so every row
    // is definitely new — NOT the empty frame the null-probe bug gave.
    val empty = docs.filter(lit(false))
    val got = BloomDedup
      .newRows(empty, shard, col("text"), col("text"), tight)
      .select(col("doc_id")).as[Long].collect().sorted
    val want = shard.select(col("doc_id")).as[Long].collect().sorted
    assert(got === want)
  }

  test("empty-corpus bootstrap: auditStats counts every row definite-new") {
    val empty = docs.filter(lit(false))
    val (total, defNew, cand, dups, fps, _) = BloomDedup
      .auditStats(empty, shard, col("text"), col("text"), tight)
      .as[(Long, Long, Long, Long, Long, Double)]
      .collect().head
    assert(total > 0L && defNew === total && cand === 0L && dups === 0L && fps === 0L)
  }

  test("the plan embeds no sketch bytes: probe ships via broadcast, not a literal") {
    val plan = BloomDedup
      .newRows(corpus, shard, col("text"), col("text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    // A lit(sketch) probe serializes numBits/8 bytes into the plan string
    // (hex-dumped binary literal); the broadcast form keeps the plan small.
    assert(plan.length < 100000, s"plan string is ${plan.length} chars — sketch bytes leaked into the plan?")
  }
}
