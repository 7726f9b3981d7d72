package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unigram-LM quality scoring laws: hand-computed smoothed log-probs on a
  * tiny corpus, OOV fallback, empty-doc neutrality, and the ranking
  * property the filter exists for (fluent text over gibberish). */
class LmScoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Corpus: N=5 tokens, V=3 types ("a":3, "b":1, "c":1); denom = N+V+1 = 9.
  private def tiny = Seq((1L, "a a a b c")).toDF("doc_id", "text")

  private def lpMicro(num: Long, den: Long): Long =
    math.round(math.log(num.toDouble / den.toDouble) * 1e6)

  test("trainUnigram: add-one smoothed log-probs plus the OOV sentinel row") {
    val lm = LmScore.trainUnigram(tiny, col("text"))
      .as[(String, Long)].collect().toMap
    assert(lm === Map(
      "a" -> lpMicro(4, 9), // (3+1)/9
      "b" -> lpMicro(2, 9),
      "c" -> lpMicro(2, 9),
      LmScore.OovToken -> lpMicro(1, 9)))
  }

  test("score: exact micro-sums, OOV fallback, empty doc scores (0, 0)") {
    val lm = LmScore.trainUnigram(tiny, col("text"))
    val scored = LmScore.score(
      Seq((1L, "a b"), (2L, "a zzz"), (3L, ""), (4L, "zzz zzz")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), lm)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(scored(1L) === ((2L, lpMicro(4, 9) + lpMicro(2, 9))))
    assert(scored(2L) === ((2L, lpMicro(4, 9) + lpMicro(1, 9)))) // zzz → OOV mass
    assert(scored(3L) === ((0L, 0L)))
    assert(scored(4L) === ((2L, 2 * lpMicro(1, 9))))
  }

  test("scoring ranks in-distribution text above OOV gibberish") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val lm   = LmScore.trainUnigram(docs, col("text"))
    // A real doc vs the same token COUNT of out-of-vocab junk: the real
    // doc's mean log-prob must win (that is the entire point of the filter).
    val probe = Seq(
      (1L, docs.orderBy("doc_id").select("text").as[String].collect().head),
      (2L, Seq.fill(20)("qqxzzyqit").mkString(" "))
    ).toDF("doc_id", "text")
    val m = LmScore.score(probe, col("doc_id"), col("text"), lm)
      .select(col("doc_id"), (col("lp_sum").cast("double") / col("n_toks")).as("mean"))
      .as[(Long, Double)].collect().toMap
    assert(m(1L) > m(2L), s"real doc did not outrank gibberish: $m")
  }

  test("incremental counts: lm(merge(counts(A), counts(B))) ≡ train(A ∪ B)") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val incremental = LmScore
      .lmFromCounts(LmScore.mergeCounts(
        LmScore.unigramCounts(a, col("text")),
        LmScore.unigramCounts(b, col("text"))))
      .as[(String, Long)].collect().sorted.toSeq
    val batch = LmScore.trainUnigram(docs, col("text"))
      .as[(String, Long)].collect().sorted.toSeq
    assert(incremental === batch, "shard-merged LM diverges from full retrain")
  }

  test("score trains at most once: the LM subtree is a materialization boundary") {
    // score() consumes the LM twice (vocab broadcast + OOV row); with a
    // lazy trainUnigram plan both consumers would re-run the corpus-wide
    // counting aggregation. The checkpoint inside score() bounds training
    // to one pass: the scoring plan must contain the TRAINING parquet
    // relation zero times (only the scored docs' in-memory frame).
    val dir = java.nio.file.Files.createTempDirectory("lm_scan_once")
    spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select("doc_id", "text").write.mode("overwrite").parquet(s"$dir/train")
    val train  = spark.read.parquet(s"$dir/train")
    val scored = LmScore.score(
      tiny, col("doc_id"), col("text"), LmScore.trainUnigram(train, col("text")))
    val plans = Seq(scored.queryExecution.optimizedPlan.toString,
                    scored.queryExecution.executedPlan.toString)
    assert(!plans.exists(_.toLowerCase.contains("parquet")),
      "scoring plan still contains the training-corpus scan")
    assert(scored.count() === 1)
  }

  test("asMapRow fold ≡ exploded score() on every doc; guard refuses an oversized vocab") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val lm   = LmScore.trainUnigram(docs.filter(col("doc_id") % 2 === 0), col("text"))
    // Probe includes OOV-heavy and empty docs so both forms exercise the
    // fallback mass and the no-evidence case.
    val probe = docs.select("doc_id", "text")
      .unionByName(Seq((9001L, "qqxzzyqit zzz unseen"), (9002L, "")).toDF("doc_id", "text"))
    val viaMap = probe
      .crossJoin(broadcast(LmScore.asMapRow(lm)))
      .select(
        col("doc_id"),
        LmScore.lpSumMicro(
          graft.functions.TextOps.tokens(col("text")), col("__lm_map"), col("__oov_lp")).as("lp"))
      .as[(Long, Long)].collect().sorted.toSeq
    val viaScore = LmScore.score(probe, col("doc_id"), col("text"), lm)
      .select("doc_id", "lp_sum").as[(Long, Long)].collect().sorted.toSeq
    assert(viaMap === viaScore, "single-row map fold diverged from the exploded join")

    // The guard: this corpus's vocab is far above a maxVocab of 8.
    val e = intercept[IllegalArgumentException](LmScore.asMapRow(lm, maxVocab = 8))
    assert(e.getMessage.contains("maxVocab"), e.getMessage)
  }

  test("score is independent of input partitioning and of LM row order") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val lm   = LmScore.trainUnigram(docs.filter(col("doc_id") % 2 === 0), col("text"))
    val a = LmScore.score(docs, col("doc_id"), col("text"), lm)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val b = LmScore.score(docs.repartition(11), col("doc_id"), col("text"), lm.repartition(5))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a === b)
  }

  test("importanceWeights ≡ two score() passes joined (single-scan fusion law)") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val tgt  = LmScore.trainUnigram(docs.filter(col("lang") === "en"), col("text"))
    val raw  = LmScore.trainUnigram(docs, col("text"))
    val fused = LmScore
      .importanceWeights(docs, col("doc_id"), col("text"), tgt, raw)
      .select("doc_id", "n_toks", "lp_target", "lp_raw", "w_micro")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val twoPass = LmScore.score(docs, col("doc_id"), col("text"), tgt)
      .select(col("doc_id"), col("n_toks"), col("lp_sum").as("lp_target"))
      .join(
        LmScore.score(docs, col("doc_id"), col("text"), raw)
          .select(col("doc_id"), col("lp_sum").as("lp_raw")),
        "doc_id")
      .select(
        col("doc_id"), col("n_toks"), col("lp_target"), col("lp_raw"),
        (col("lp_target") - col("lp_raw")).as("w_micro"))
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(fused === twoPass, "fused dual-LM scoring diverged from two independent score() passes")
  }

  test("bigram LM: hand-computed conditional log-probs with both fallback tiers") {
    // Reference: "a b", "a c" → uni a:2, b:1, c:1 (V=3); bigrams (a,b):1,
    // (a,c):1. Seen pair (a,b): ln((1+1)/(2+3+1)); unseen successor of b:
    // ln(1/(1+3+1)); unseen w1 z: ln(1/(3+1)).
    val ref = Seq((0L, "a b"), (1L, "a c")).toDF("doc_id", "text")
    val model = LmScore.trainBigram(ref, col("text"))
    val docs = Seq((10L, "a b"), (11L, "b a"), (12L, "z z"), (13L, "a")).toDF("doc_id", "text")
    val out = LmScore
      .scoreBigram(docs, col("doc_id"), col("text"), model)
      .as[(Long, Long, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(out(10L)._3 === lpMicro(2, 6))
    assert(out(11L)._3 === lpMicro(1, 5))
    assert(out(12L)._3 === lpMicro(1, 4))
    assert(out(13L) === ((13L, 0L, 0L, None)), "a 1-token doc has no bigram evidence")
  }

  test("bigram scoring is independent of input partitioning") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val model = LmScore.trainBigram(docs.filter(col("doc_id") % 10 === 0), col("text"))
    def run(d: org.apache.spark.sql.DataFrame) = LmScore
      .scoreBigram(d, col("doc_id"), col("text"), model)
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(run(docs) === run(docs.repartition(11)))
  }

  test("dsirSelect ranks target-domain docs first; empty doc carries weight 0") {
    // Target domain: prose over {sun, rises, slowly}; raw corpus also holds
    // numeric boilerplate. The in-domain doc must win selection and the
    // boilerplate doc must weigh LESS than it; the empty doc weighs 0.
    val docs = Seq(
      (1L, "the sun rises slowly the sun rises"),
      (2L, "0 1 2 3 4 5 6 7 8 9"),
      (3L, "")
    ).toDF("doc_id", "text")
    val tgt = LmScore.trainUnigram(Seq.fill(3)("the sun rises slowly").toDF("text"), col("text"))
    val raw = LmScore.trainUnigram(docs, col("text"))
    val top = LmScore
      .dsirSelect(docs, col("doc_id"), col("text"), tgt, raw, n = 1)
      .select("doc_id").as[Long].collect().toSeq
    assert(top === Seq(1L), s"in-domain doc not selected first: $top")
    val w = LmScore
      .importanceWeights(docs, col("doc_id"), col("text"), tgt, raw)
      .select("doc_id", "w_micro").as[(Long, Long)].collect().toMap
    assert(w(3L) === 0L, "empty doc must carry zero evidence")
    assert(w(1L) > w(2L), s"boilerplate outranked in-domain text: $w")
  }
}
