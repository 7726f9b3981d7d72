package graft.pipelines

import java.nio.file.Files

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
    // Audit counts are observed metrics of the run above — no re-execution.
    val counts = audit.counts
    assert(counts === Map("input" -> 6L, "exact_dedup" -> 5L, "near_dedup" -> 4L, "gated" -> 2L))
    // enrichment columns present and populated
    val row = out.filter(col("doc_id") === 1).collect().head
    assert(row.getAs[Long]("n_tok") > 0 && row.getAs[Long]("fp") >= 0)
  }

  test("near-dup survivors are one MINIMUM id per connected cluster (star case)") {
    // s3 (id 3) near-dups BOTH s1 and s2, but s1 !~ s2: all three form one
    // connected cluster, so exactly the minimum (1) survives. The round-3
    // drop-doc_b-of-each-pair policy kept {1, 2} here — cluster policy is
    // the behavioral change under test.
    val aToks = (1 to 20).map(i => s"alpha$i").mkString(" ")
    val bToks = (1 to 20).map(i => s"bravo$i").mkString(" ")
    val docs = Seq(
      (1L, aToks),
      (2L, bToks),
      (3L, s"$aToks $bToks"), // token-Jaccard 0.5 with each of 1 and 2
      (9L, "completely unrelated corpus document about catalyst plans today")
    ).toDF("doc_id", "text")
    val cfg = CorpusPrep.Config(
      minhash = graft.operators.Dedup
        .MinHashParams(numHashes = 64, numBands = 32, jaccardThreshold = 0.45),
      minTokens = 3,
      maxStopwordRatio = 0.95
    )
    val (out, _) = CorpusPrep.prepare(docs, col("doc_id"), col("text"), cfg)
    assert(out.select("doc_id").as[Long].collect().sorted === Array(1L, 9L))
  }

  test("incremental shard dedup ≡ batch over the union (signature store path)") {
    val longA = (1 to 20).map(i => s"tok$i").mkString(" ")
    val longANear = ((1 to 10).map(i => s"tok$i") ++ Seq("CHANGED") ++ (12 to 20).map(i => s"tok$i")).mkString(" ")
    val longC = (1 to 20).map(i => s"new$i").mkString(" ")
    val longCNear = ((1 to 10).map(i => s"new$i") ++ Seq("EDITED") ++ (12 to 20).map(i => s"new$i")).mkString(" ")
    val oldShard = Seq(
      (1L, longA),
      (2L, longA), // exact dup of 1
      (4L, "a thoroughly different document describing shuffle partitioning strategies in detail")
    ).toDF("doc_id", "text")
    val newShard = Seq(
      (11L, longA),     // exact dup of stored 1 → content_hash hit
      (12L, longANear), // near dup of stored 1 → sketch-estimate hit
      (13L, longC),     // genuinely new
      (14L, longCNear), // near dup of 13, within-shard → cluster keeps 13
      (15L, "tiny doc") // survives dedup, gated out (minTokens)
    ).toDF("doc_id", "text")
    val cfg = CorpusPrep.Config(
      minhash = graft.operators.Dedup
        .MinHashParams(numHashes = 64, numBands = 16, jaccardThreshold = 0.5),
      minTokens = 3,
      maxStopwordRatio = 0.95
    )

    val (batchAll, _) =
      CorpusPrep.prepare(oldShard.unionByName(newShard), col("doc_id"), col("text"), cfg)
    val (batchOld, _) = CorpusPrep.prepare(oldShard, col("doc_id"), col("text"), cfg)
    // Old-shard gates drop nothing, so the store is exactly the batch
    // survivors' signatures (in general: signatures of pre-gate survivors).
    val store = CorpusPrep.signatures(
      oldShard.join(batchOld.select("doc_id"), "doc_id"), col("doc_id"), col("text"), cfg.minhash)

    val (incNew, audit, storeDelta) =
      CorpusPrep.prepareIncremental(newShard, col("doc_id"), col("text"), store, cfg)

    val combined = (batchOld.select("doc_id").as[Long].collect() ++
      incNew.select("doc_id").as[Long].collect()).sorted
    assert(combined === batchAll.select("doc_id").as[Long].collect().sorted)

    // The store delta is exactly the shard's pre-gate survivors — 15 is in
    // it (gated for quality, still a dedup source), 11/12/14 not; the
    // updated store (store ∪ delta) covers every union pre-gate survivor.
    assert(storeDelta.select("doc_id").as[Long].collect().sorted === Array(13L, 15L))
    assert(store.unionByName(storeDelta).select("doc_id").as[Long].collect().sorted ===
      Array(1L, 4L, 13L, 15L))

    val stages = audit.counts
    assert(stages === Map(
      "input" -> 5L, "exact_dedup" -> 4L, "store_dedup" -> 3L,
      "near_dedup" -> 2L, "gated" -> 1L))

    // With decontamination configured the law must still hold: an eval
    // doc verbatim-matching the new shard's survivor (13) removes it from
    // BOTH the batch and incremental outputs, while the store delta stays
    // pre-decontam (13 keeps suppressing its future near-dups).
    val eval_ = Seq((900L, longC)).toDF("doc_id", "text")
    val dCfg = cfg.copy(decontam = Some(CorpusPrep.Decontam(
      eval_, col("doc_id"), col("text"), shingleSize = 3)))
    val (dBatchAll, _) =
      CorpusPrep.prepare(oldShard.unionByName(newShard), col("doc_id"), col("text"), dCfg)
    val (dIncNew, dAudit, dDelta) =
      CorpusPrep.prepareIncremental(newShard, col("doc_id"), col("text"), store, dCfg)
    val dCombined = (batchOld.select("doc_id").as[Long].collect() ++
      dIncNew.select("doc_id").as[Long].collect()).sorted
    assert(dCombined === dBatchAll.select("doc_id").as[Long].collect().sorted)
    assert(!dCombined.contains(13L), "contaminated doc 13 survived")
    assert(dDelta.select("doc_id").as[Long].collect().sorted === Array(13L, 15L),
      "store delta must stay pre-decontam")
    assert(dAudit.counts("decontam") === 1L, dAudit.counts.toString)
  }

  test("prepared frame never rescans the source: exact stage is a checkpoint boundary") {
    val dir = Files.createTempDirectory("corpus_scan_once")
    corpus.write.mode("overwrite").parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")
    val cfg = CorpusPrep.Config(
      minhash = graft.operators.Dedup
        .MinHashParams(numHashes = 32, numBands = 16, jaccardThreshold = 0.5),
      minTokens = 3,
      maxStopwordRatio = 0.8)
    val (out, audit) = CorpusPrep.prepare(docs, col("doc_id"), col("text"), cfg)
    // The exact-dedup stage (the subtree consumed by BOTH pair generation
    // and the final anti-join) was materialized once at construction;
    // everything the returned frame executes reads that checkpoint. A
    // parquet relation left in the plan = the round-6 double-scan bug.
    val plans = Seq(out.queryExecution.optimizedPlan.toString,
                    out.queryExecution.executedPlan.toString)
    assert(!plans.exists(_.toLowerCase.contains("parquet")),
      "prepared frame still re-reads the parquet source")
    assert(out.count() === 2)
    assert(audit.counts("input") === 6L)
  }

  test("streamingPrepare: micro-batched shards ≡ batch over the union, store grows by deltas") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val longA = (1 to 20).map(i => s"tok$i").mkString(" ")
    val longC = (1 to 20).map(i => s"new$i").mkString(" ")
    val shard1 = Seq(
      (1L, longA),
      (2L, longA), // exact dup within the first batch
      (4L, "a thoroughly different document describing shuffle partitioning strategies in detail"))
    val shard2 = Seq(
      (11L, longA), // exact dup of stored 1 across batches
      (13L, longC), // new
      (15L, "tiny doc")) // survives dedup, gated out, still enters the store
    val cfg = CorpusPrep.Config(
      minhash = graft.operators.Dedup
        .MinHashParams(numHashes = 64, numBands = 16, jaccardThreshold = 0.5),
      minTokens = 3,
      maxStopwordRatio = 0.95)

    val base  = Files.createTempDirectory("corpus_stream")
    val store = s"$base/store"
    val out   = s"$base/out"
    val ckpt  = s"$base/ckpt"

    val mem = MemoryStream[(Long, String)]
    val q = CorpusPrep
      .streamingPrepare(
        mem.toDF().toDF("doc_id", "text"),
        col("doc_id"), col("text"), store, out, ckpt, cfg)
      .start()
    try {
      mem.addData(shard1: _*); q.processAllAvailable()
      mem.addData(shard2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted
    val (batchAll, _) = CorpusPrep.prepare(
      (shard1 ++ shard2).toDF("doc_id", "text"), col("doc_id"), col("text"), cfg)
    assert(streamed === batchAll.select("doc_id").as[Long].collect().sorted)

    // Store = one delta per micro-batch, pre-gate survivors only.
    val storeIds = CorpusPrep.readStore(spark, store).select("doc_id").as[Long].collect().sorted
    assert(storeIds === Array(1L, 4L, 13L, 15L))
  }

  test("streamingPrepare with decontam + LM gates ≡ batch with the same config") {
    // The round-8 gates flow through the streaming path via
    // prepareIncremental; this pins the composition end to end: a leaked
    // eval doc arriving in a LATER micro-batch is decontaminated, OOV
    // gibberish is LM-gated, and the result equals the batch run.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.LmScore
    implicit val sqlCtx = spark.sqlContext

    val longA = (1 to 20).map(i => s"tok$i").mkString(" ")
    val longC = (1 to 20).map(i => s"new$i").mkString(" ")
    val evalDoc = "held out benchmark question about distributed joins and watermarks tonight"
    val shard1 = Seq(
      (1L, longA),
      (4L, "a thoroughly different document describing shuffle partitioning strategies in detail"))
    val shard2 = Seq(
      (13L, longC),
      (14L, evalDoc),                              // verbatim eval leak → decontam
      (16L, Seq.fill(12)("qqxzzyqit").mkString(" "))) // OOV soup → LM gate
    val refDocs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val lm = LmScore.trainUnigram(
      refDocs.select(col("text")).unionByName(Seq(longA, longC).toDF("text")), col("text"))
      .localCheckpoint() // one LM artifact shared by every micro-batch
    val oovLp = lm.filter(col("token") === LmScore.OovToken)
      .select("lp_micro").as[Long].collect().head
    val eval_ = Seq((900L, evalDoc)).toDF("doc_id", "text")
    val cfg = CorpusPrep.Config(
      minhash = graft.operators.Dedup
        .MinHashParams(numHashes = 64, numBands = 16, jaccardThreshold = 0.5),
      minTokens = 3,
      maxStopwordRatio = 0.95,
      lmGate = Some(CorpusPrep.LmGate(lm, minMeanLpMicro = oovLp + 1)),
      decontam = Some(CorpusPrep.Decontam(eval_, col("doc_id"), col("text"), shingleSize = 3)))

    val base = Files.createTempDirectory("corpus_stream_gated")
    val mem  = MemoryStream[(Long, String)]
    val q = CorpusPrep
      .streamingPrepare(
        mem.toDF().toDF("doc_id", "text"),
        col("doc_id"), col("text"), s"$base/store", s"$base/out", s"$base/ckpt", cfg)
      .start()
    try {
      mem.addData(shard1: _*); q.processAllAvailable()
      mem.addData(shard2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(s"$base/out").select("doc_id").as[Long].collect().sorted
    assert(!streamed.contains(14L), "leaked eval doc survived streaming decontam")
    assert(!streamed.contains(16L), "OOV gibberish survived the streaming LM gate")
    val (batchAll, _) = CorpusPrep.prepare(
      (shard1 ++ shard2).toDF("doc_id", "text"), col("doc_id"), col("text"), cfg)
    assert(streamed === batchAll.select("doc_id").as[Long].collect().sorted)
  }

  test("streamingPrepare replay: re-running a batch after its delta committed loses nothing") {
    // Crash model: batch N wrote its delta (and maybe its output) but the
    // checkpoint did not commit, so the engine re-runs batch N. Without
    // the readStore beforeBatch guard, the re-run would see its own
    // signatures in the store and drop ALL its docs as duplicates.
    val longA = (1 to 20).map(i => s"tok$i").mkString(" ")
    val cfg = CorpusPrep.Config(
      minhash = graft.operators.Dedup
        .MinHashParams(numHashes = 64, numBands = 16, jaccardThreshold = 0.5),
      minTokens = 3,
      maxStopwordRatio = 0.95)
    val base  = Files.createTempDirectory("corpus_replay")
    val store = s"$base/store"
    val out   = s"$base/out"

    val b0 = Seq((1L, longA), (4L, "distinct doc about adaptive query execution plans")).toDF("doc_id", "text")
    CorpusPrep.processBatch(b0, col("doc_id"), col("text"), store, out, 0L, cfg)
    val firstRun = spark.read.parquet(s"$out/batch=0").select("doc_id").as[Long].collect().sorted
    assert(firstRun === Array(1L, 4L))

    // Replay batch 0 (same id, same data) — output must be identical, not empty.
    CorpusPrep.processBatch(b0, col("doc_id"), col("text"), store, out, 0L, cfg)
    val replayed = spark.read.parquet(s"$out/batch=0").select("doc_id").as[Long].collect().sorted
    assert(replayed === firstRun, "replayed batch dropped its own docs against its own delta")
    assert(CorpusPrep.readStore(spark, store).select("doc_id").as[Long].collect().sorted ===
      Array(1L, 4L))

    // The NEXT batch still sees batch 0's delta (dedup across batches intact).
    val b1 = Seq((11L, longA)).toDF("doc_id", "text")
    CorpusPrep.processBatch(b1, col("doc_id"), col("text"), store, out, 1L, cfg)
    assert(spark.read.parquet(s"$out/batch=1").count() === 0, "cross-batch dedup broken")
  }

  test("compactStore folds the delta log without changing reads or the replay guard") {
    val longA = (1 to 20).map(i => s"tok$i").mkString(" ")
    val longC = (1 to 20).map(i => s"new$i").mkString(" ")
    val cfg = CorpusPrep.Config(
      minhash = graft.operators.Dedup
        .MinHashParams(numHashes = 64, numBands = 16, jaccardThreshold = 0.5),
      minTokens = 3,
      maxStopwordRatio = 0.95)
    val base  = Files.createTempDirectory("corpus_compact")
    val store = s"$base/store"
    val out   = s"$base/out"

    val batches = Seq(
      Seq((1L, longA), (4L, "distinct doc about adaptive query execution plans today")),
      Seq((11L, longA), (13L, longC)), // 11 dups stored 1
      Seq((21L, "another fully distinct document discussing shuffle partition sizing")),
      Seq((31L, longC)) // dups stored 13
    )
    batches.zipWithIndex.foreach { case (rows, i) =>
      CorpusPrep.processBatch(
        rows.toDF("doc_id", "text"), col("doc_id"), col("text"), store, out, i.toLong, cfg)
    }
    val before = CorpusPrep.readStore(spark, store).select("doc_id").as[Long].collect().sorted

    CorpusPrep.compactStore(spark, store)

    // Deltas 0..2 folded into delta=2; delta=3 (newest, still replayable) kept.
    val dirs = new java.io.File(store).listFiles().map(_.getName).filter(_.startsWith("delta=")).sorted
    assert(dirs === Array("delta=2", "delta=3"), dirs.toSeq.toString)
    // Full read unchanged.
    assert(CorpusPrep.readStore(spark, store).select("doc_id").as[Long].collect().sorted === before)
    // Replay guard: a replay of batch 3 must see exactly deltas < 3 — the
    // compacted dir (id 2) qualifies, its own delta does not.
    assert(CorpusPrep.readStore(spark, store, beforeBatch = Some(3L))
      .select("doc_id").as[Long].collect().sorted === Array(1L, 4L, 13L, 21L))
    // And the replay itself still produces identical output (no self-match).
    CorpusPrep.processBatch(
      batches(3).toDF("doc_id", "text"), col("doc_id"), col("text"), store, out, 3L, cfg)
    assert(spark.read.parquet(s"$out/batch=3").count() === 0, "31 should still dup stored 13")
    assert(CorpusPrep.readStore(spark, store).select("doc_id").as[Long].collect().sorted === before)

    // Idempotence: compacting again folds nothing further that breaks reads.
    CorpusPrep.compactStore(spark, store)
    assert(CorpusPrep.readStore(spark, store).select("doc_id").as[Long].collect().sorted === before)
  }

  test("streamingPrepare with compactEvery keeps the delta-log bounded, results unchanged") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val longA = (1 to 20).map(i => s"tok$i").mkString(" ")
    val cfg = CorpusPrep.Config(
      minhash = graft.operators.Dedup
        .MinHashParams(numHashes = 64, numBands = 16, jaccardThreshold = 0.5),
      minTokens = 3,
      maxStopwordRatio = 0.95,
      compactEvery = 2)
    val base  = Files.createTempDirectory("corpus_stream_compact")
    val store = s"$base/store"
    val out   = s"$base/out"
    val ckpt  = s"$base/ckpt"

    val mem = MemoryStream[(Long, String)]
    val q = CorpusPrep
      .streamingPrepare(
        mem.toDF().toDF("doc_id", "text"),
        col("doc_id"), col("text"), store, out, ckpt, cfg)
      .start()
    try {
      mem.addData((1L, longA), (4L, "distinct doc about adaptive query execution today"))
      q.processAllAvailable()
      mem.addData((11L, longA)) // cross-batch dup of 1
      q.processAllAvailable()
      mem.addData((21L, "another fully distinct document about broadcast joins tonight"))
      q.processAllAvailable()
      mem.addData((31L, longA)) // still dups 1 after compaction
      q.processAllAvailable()
    } finally q.stop()

    // 4 batches with compactEvery=2 → the log was folded at batch 2: fewer
    // than 4 delta dirs remain, and the surviving ids parse + stay ordered.
    val dirs = new java.io.File(store).listFiles().map(_.getName).filter(_.startsWith("delta=")).sorted
    assert(dirs.length < 4, s"delta log unbounded: ${dirs.toSeq}")
    // Dedup across the whole history intact despite folding.
    val streamed = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted
    assert(streamed === Array(1L, 4L, 21L))
    assert(CorpusPrep.readStore(spark, store).select("doc_id").as[Long].collect().sorted ===
      Array(1L, 4L, 21L))
  }

  test("long stream with compactEvery=3: delta-dir count stays bounded, results ≡ uncompacted") {
    // The bounded-directory-count claim over a LONG stream: 9 micro-batches
    // through the exact per-batch path of streamingPrepare, one store
    // compacted on a 3-batch cadence, the control store never compacted.
    // With compactEvery=3 the log is folded at ids 3 and 6, so the dir
    // count after any batch never exceeds compactEvery + 1 = 4 — the
    // steady-state bound for ANY stream length — while reads and dedup
    // behavior stay identical to the unbounded control.
    val longA = (1 to 20).map(i => s"tok$i").mkString(" ")
    val mk = (n: Int) => (1 to 20).map(i => s"b${n}tok$i").mkString(" ")
    val cfgC = CorpusPrep.Config(
      minhash = graft.operators.Dedup
        .MinHashParams(numHashes = 64, numBands = 16, jaccardThreshold = 0.5),
      minTokens = 3, maxStopwordRatio = 0.95, compactEvery = 3)
    val cfgU  = cfgC.copy(compactEvery = 0)
    val base  = Files.createTempDirectory("corpus_long_compact")
    // Batch i carries one fresh doc (id 10i+1) and one dup of batch 0's doc.
    val batches = (0 until 9).map { i =>
      if (i == 0) Seq((1L, longA), (2L, mk(0)))
      else Seq((i * 10L + 1, mk(i)), (i * 10L + 2, longA))
    }

    var maxDirs = 0
    for ((rows, i) <- batches.zipWithIndex) {
      val df = rows.toDF("doc_id", "text")
      CorpusPrep.processBatch(df, col("doc_id"), col("text"), s"$base/storeC", s"$base/outC", i.toLong, cfgC)
      CorpusPrep.processBatch(df, col("doc_id"), col("text"), s"$base/storeU", s"$base/outU", i.toLong, cfgU)
      val dirs = new java.io.File(s"$base/storeC").listFiles()
        .map(_.getName).count(_.startsWith("delta="))
      maxDirs = math.max(maxDirs, dirs)
    }
    assert(maxDirs <= 4, s"delta log exceeded the compactEvery+1 bound: $maxDirs dirs")
    // The uncompacted control grew one dir per batch — the cost being bounded away.
    assert(new java.io.File(s"$base/storeU").listFiles()
      .map(_.getName).count(_.startsWith("delta=")) === 9)
    // Identical survivors batch-by-batch and identical store contents.
    val outC = spark.read.parquet(s"$base/outC").select("doc_id").as[Long].collect().sorted
    val outU = spark.read.parquet(s"$base/outU").select("doc_id").as[Long].collect().sorted
    assert(outC === outU)
    assert(outC === (Seq(1L, 2L) ++ (1 until 9).map(_ * 10L + 1)).sorted.toArray)
    assert(CorpusPrep.readStore(spark, s"$base/storeC").select("doc_id").as[Long].collect().sorted ===
      CorpusPrep.readStore(spark, s"$base/storeU").select("doc_id").as[Long].collect().sorted)
  }

  test("classifier gate: keepAbove sweeps monotonically between rule-only and empty") {
    val cfg = CorpusPrep.Config(
      minhash = graft.operators.Dedup
        .MinHashParams(numHashes = 32, numBands = 16, jaccardThreshold = 0.5),
      minTokens = 3,
      maxStopwordRatio = 0.8)
    val model = (t: Double) =>
      Some(CorpusPrep.QualityModel(Array(1.2, -1.5, 0.8, 2.0), bias = -2.0, keepAbove = t))
    def ids(c: CorpusPrep.Config) =
      CorpusPrep.prepare(corpus, col("doc_id"), col("text"), c)._1
        .select("doc_id").as[Long].collect().sorted.toSeq

    val ruleOnly = ids(cfg)
    // σ is strictly in (0,1): threshold 0 gates nothing, threshold 1 everything.
    assert(ids(cfg.copy(classifier = model(0.0))) === ruleOnly)
    assert(ids(cfg.copy(classifier = model(1.0))) === Seq.empty)
    // Stricter thresholds keep subsets (monotone gate).
    val sweep = Seq(0.0, 0.4, 0.6, 1.0).map(t => ids(cfg.copy(classifier = model(t))).toSet)
    assert(sweep.sliding(2).forall { case Seq(loose, strict) => strict.subsetOf(loose) })
    // The gate enriches output with a (0,1) quality column.
    val q = CorpusPrep.prepare(corpus, col("doc_id"), col("text"), cfg.copy(classifier = model(0.0)))
      ._1.select("quality").as[Double].collect()
    assert(q.nonEmpty && q.forall(x => x > 0.0 && x < 1.0))
    // Without a classifier the column does not exist (schema unchanged).
    assert(!CorpusPrep.prepare(corpus, col("doc_id"), col("text"), cfg)._1
      .columns.contains("quality"))
  }

  test("LM gate: narrow map-lookup form ≡ exploded score form; OOD docs drop") {
    import graft.operators.LmScore
    val cfg = CorpusPrep.Config(
      minhash = graft.operators.Dedup
        .MinHashParams(numHashes = 32, numBands = 16, jaccardThreshold = 0.5),
      minTokens = 3,
      maxStopwordRatio = 0.9)
    // Reference LM trained on the fixture corpus; probe adds an
    // in-distribution doc and an OOV-gibberish doc of the same length.
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val lm   = LmScore.trainUnigram(docs, col("text"))
    val junk = (700L, Seq.fill(12)("qqxzzyqit").mkString(" "))
    val probe = corpus.unionByName(Seq(junk).toDF("doc_id", "text"))

    // Threshold between the two populations: junk scores ≈ ln(1/(N+V+1)),
    // real text far above. Use the OOV lp + 1 as the cut.
    val oovLp = lm.filter(col("token") === LmScore.OovToken)
      .select("lp_micro").as[Long].collect().head
    val gateCfg = cfg.copy(lmGate = Some(CorpusPrep.LmGate(lm, minMeanLpMicro = oovLp + 1)))

    val (out, _) = CorpusPrep.prepare(probe, col("doc_id"), col("text"), gateCfg)
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(700L), "pure-OOV gibberish survived the LM gate")
    assert(kept.contains(1L) && kept.contains(4L), s"in-distribution docs dropped: $kept")

    // Law: the gate's survivors are exactly the rule-gate survivors whose
    // exploded-form mean log-prob clears the threshold.
    val (ruleOnly, _) = CorpusPrep.prepare(probe, col("doc_id"), col("text"), cfg)
    val expected = LmScore.score(ruleOnly, col("doc_id"), col("text"), lm)
      .filter(col("lp_sum") >= lit(oovLp + 1) * col("n_toks"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === expected, "narrow map-lookup gate diverges from exploded scoring")

    // mean_lp_micro column present with the gate, absent without.
    assert(out.columns.contains("mean_lp_micro"))
    assert(!ruleOnly.columns.contains("mean_lp_micro"))

    // Vocab-guard fallback: forcing the map ceiling below this vocab sends
    // the gate down the exploded score() join — survivors, schema, and the
    // mean_lp_micro values must be IDENTICAL (only the plan differs).
    val (outBig, _) = CorpusPrep.prepare(
      probe, col("doc_id"), col("text"), gateCfg.copy(lmMapMaxVocab = 1L))
    assert(outBig.columns.toSeq === out.columns.toSeq)
    assert(
      outBig.select("doc_id", "mean_lp_micro").as[(Long, Long)].collect().sorted.toSeq ===
        out.select("doc_id", "mean_lp_micro").as[(Long, Long)].collect().sorted.toSeq,
      "exploded-join fallback diverged from the map-row gate")
  }

  test("decontam stage drops survivors sharing verbatim k-grams with the eval set") {
    val cfg = CorpusPrep.Config(
      minhash = graft.operators.Dedup
        .MinHashParams(numHashes = 32, numBands = 16, jaccardThreshold = 0.5),
      minTokens = 3,
      maxStopwordRatio = 0.8)
    // Eval doc copies doc 4's text verbatim → doc 4 must drop; doc 1
    // shares no trigram with the eval set and must survive.
    val eval_ = Seq(
      (100L, "completely different document about distributed query engines and shuffles today"))
      .toDF("doc_id", "text")
    val dCfg = cfg.copy(decontam = Some(CorpusPrep.Decontam(
      eval_, col("doc_id"), col("text"), shingleSize = 3)))
    val (out, audit) = CorpusPrep.prepare(corpus, col("doc_id"), col("text"), dCfg)
    val kept = out.select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L), s"contaminated doc 4 survived (or doc 1 dropped): ${kept.toSeq}")
    val counts = audit.counts
    assert(counts("decontam") === 3L, counts.toString) // 4 near-dedup survivors - doc 4
    assert(counts("gated") === 1L, counts.toString)
    // Without the stage: no "decontam" audit row, doc 4 survives.
    val (plain, auditPlain) = CorpusPrep.prepare(corpus, col("doc_id"), col("text"), cfg)
    assert(plain.select("doc_id").as[Long].collect().sorted === Array(1L, 4L))
    assert(!auditPlain.counts.contains("decontam"))
  }

  test("spanDedup stage rewrites survivors' text in place; remnants fall to the token gate") {
    // Doc 20 embeds doc 10's 6-token opening run; doc 30 is NOTHING BUT
    // that run plus two filler tokens, so after the span cut it falls
    // under minTokens and must be gated out (the stage itself drops no
    // rows — the gate does).
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta unique prose continues here onward"),
      (20L, "fresh intro alpha beta gamma delta epsilon zeta fresh outro closing"),
      (30L, "alpha beta gamma delta epsilon zeta pad end")
    ).toDF("doc_id", "text")
    val cfg = CorpusPrep.Config(
      minhash = graft.operators.Dedup
        .MinHashParams(numHashes = 32, numBands = 16, jaccardThreshold = 0.9),
      minTokens = 3,
      maxStopwordRatio = 1.0,
      spanDedup = Some(CorpusPrep.SpanDedup(k = 3)))
    val (out, audit) = CorpusPrep.prepare(docs, col("doc_id"), col("text"), cfg)
    val byId = out.select(col("doc_id"), col("text"), col("n_tok"))
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId.keySet === Set(10L, 20L), s"expected 10 kept, 20 cleaned, 30 gated: ${byId.keySet}")
    assert(byId(10L)._1.startsWith("alpha beta gamma"), "canonical doc 10 was rewritten")
    assert(byId(20L)._1 === "fresh intro fresh outro closing",
      s"span not cut from doc 20: ${byId(20L)._1}")
    assert(byId(20L)._2 === 5L, "n_tok must reflect the CLEANED text")
    val counts = audit.counts
    assert(counts("span_dedup") === 3L, s"span stage must drop no rows: $counts")
    assert(counts("gated") === 2L, counts.toString)
    // Without the stage, doc 20 keeps its original text and doc 30 survives.
    val (plain, _) = CorpusPrep.prepare(docs, col("doc_id"), col("text"),
      cfg.copy(spanDedup = None))
    assert(plain.count() === 3)
  }

  test("full gate stack ≡ intersection of its single-gate runs (composition law)") {
    // Every optional stage (decontam, classifier, LM) is an independent
    // per-doc filter layered on the same dedup backbone, so the all-gates
    // pipeline must keep EXACTLY the docs every single-gate run keeps —
    // the law d0_corpus_prep_full leans on: the composition adds no
    // interaction beyond set intersection.
    import graft.operators.LmScore
    val refDocs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val lm = LmScore.trainUnigram(refDocs, col("text")).localCheckpoint()
    val oovLp = lm.filter(col("token") === LmScore.OovToken)
      .select("lp_micro").as[Long].collect().head
    val probe = corpus.unionByName(Seq(
      (700L, Seq.fill(12)("qqxzzyqit").mkString(" ")) // OOV soup → LM gate
    ).toDF("doc_id", "text"))
    val eval_ = Seq( // verbatim copy of doc 4 → decontam drops it
      (100L, "completely different document about distributed query engines and shuffles today"))
      .toDF("doc_id", "text")
    val base = CorpusPrep.Config(
      minhash = graft.operators.Dedup
        .MinHashParams(numHashes = 32, numBands = 16, jaccardThreshold = 0.5),
      minTokens = 3,
      maxStopwordRatio = 0.9)
    val decontamOn   = Some(CorpusPrep.Decontam(eval_, col("doc_id"), col("text"), shingleSize = 3))
    val classifierOn = Some(CorpusPrep.QualityModel(Array(1.2, -1.5, 0.8, 2.0), -2.0, keepAbove = 0.4))
    val lmOn         = Some(CorpusPrep.LmGate(lm, minMeanLpMicro = oovLp + 1))
    def ids(c: CorpusPrep.Config): Set[Long] =
      CorpusPrep.prepare(probe, col("doc_id"), col("text"), c)._1
        .select("doc_id").as[Long].collect().toSet

    val full = ids(base.copy(decontam = decontamOn, classifier = classifierOn, lmGate = lmOn))
    val (dOnly, cOnly, lOnly) = (
      ids(base.copy(decontam = decontamOn)),
      ids(base.copy(classifier = classifierOn)),
      ids(base.copy(lmGate = lmOn)))
    assert(full === (dOnly intersect cOnly intersect lOnly),
      s"full=$full d=$dOnly c=$cOnly l=$lOnly")
    assert(full.subsetOf(ids(base)))
    // The composition is non-trivial on this fixture: each gate bites.
    assert(!dOnly.contains(4L), "decontam gate inert")
    assert(!lOnly.contains(700L), "LM gate inert")
    assert(full.nonEmpty, "all docs gated — law vacuous")
  }

  test("pipeline is idempotent on its own output") {
    val cfg = CorpusPrep.Config(minTokens = 3, maxStopwordRatio = 0.8)
    val (once, _)  = CorpusPrep.prepare(corpus, col("doc_id"), col("text"), cfg)
    val (twice, _) = CorpusPrep.prepare(once.select("doc_id", "text"), col("doc_id"), col("text"), cfg)
    assert(once.select("doc_id").as[Long].collect().sorted ===
      twice.select("doc_id").as[Long].collect().sorted)
  }

  // ---- oracle-artifact replay laws: the materialized loser-id frames the
  // d0 DuckDB oracles read back must reproduce the pipeline's own dedup
  // decisions EXACTLY, or the oracle would re-verify a different pipeline.

  test("nearDupLoserIds replay ≡ prepare's dedup stages (gates disabled)") {
    val p = graft.operators.Dedup
      .MinHashParams(numHashes = 32, numBands = 16, jaccardThreshold = 0.5)
    // Gates off (minTokens 0, ratio 1.0): survivors are exactly the dedup
    // stages' output, which the replay reconstructs as exact-keep-lowest
    // minus the loser artifact. (All fixture docs tokenize non-empty, so
    // the fail-closed null stop_ratio path stays out of scope here.)
    val cfg = CorpusPrep.Config(minhash = p, minTokens = 0, maxStopwordRatio = 1.0)
    val (out, _) = CorpusPrep.prepare(corpus, col("doc_id"), col("text"), cfg)

    val exact = graft.operators.Dedup
      .exact(corpus, col("text"), col("doc_id")).drop("content_hash")
    val losers = CorpusPrep
      .nearDupLoserIds(exact, col("doc_id"), col("text"), p)
      .as[Long].collect().toSet
    val replay = exact.select("doc_id").as[Long].collect().filterNot(losers).sorted
    assert(out.select("doc_id").as[Long].collect().sorted === replay)
    assert(losers.nonEmpty, "no near-dup fired — law vacuous")
  }

  test("incrementalNearDupLoserIds replay ≡ prepareIncremental's dedup stages") {
    val longA     = (1 to 20).map(i => s"tok$i").mkString(" ")
    val longANear = ((1 to 10).map(i => s"tok$i") ++ Seq("CHANGED") ++
      (12 to 20).map(i => s"tok$i")).mkString(" ")
    val longC     = (1 to 20).map(i => s"new$i").mkString(" ")
    val longCNear = ((1 to 10).map(i => s"new$i") ++ Seq("EDITED") ++
      (12 to 20).map(i => s"new$i")).mkString(" ")
    val oldShard = Seq((1L, longA), (4L, "a thoroughly different stored document")).toDF("doc_id", "text")
    val newShard = Seq(
      (11L, longA),     // exact store hit (sha algebra — NOT in the artifact)
      (12L, longANear), // cross-store sketch loser (artifact)
      (13L, longC),
      (14L, longCNear), // within-shard cluster loser (artifact)
      (15L, longC),     // within-shard exact dup of 13 (sha algebra)
      (16L, "a shard document about something else entirely")
    ).toDF("doc_id", "text")
    val p = graft.operators.Dedup
      .MinHashParams(numHashes = 64, numBands = 16, jaccardThreshold = 0.5)
    val cfg   = CorpusPrep.Config(minhash = p, minTokens = 0, maxStopwordRatio = 1.0)
    val store = CorpusPrep.signatures(oldShard, col("doc_id"), col("text"), p)

    val (out, _, _) = CorpusPrep.prepareIncremental(newShard, col("doc_id"), col("text"), store, cfg)

    // The oracle's sha-256 set algebra: within-shard keep-lowest, then
    // drop content hashes the store already holds…
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))
    val shardExact = newShard
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
      .withColumn("__h", sha2(col("text"), 256))
      .join(store.select(col("content_hash").as("__h")).distinct(), Seq("__h"), "left_anti")
      .drop("__h")
    // …then the ONE artifact covers both xxhash stages.
    val losers = CorpusPrep
      .incrementalNearDupLoserIds(newShard, col("doc_id"), col("text"), store, p)
      .as[Long].collect().toSet
    val replay = shardExact.select("doc_id").as[Long].collect().filterNot(losers).sorted
    assert(out.select("doc_id").as[Long].collect().sorted === replay)
    assert(losers.contains(12L) && losers.contains(14L), s"expected both xxhash stages to fire: $losers")
    assert(replay === Array(13L, 16L), replay.mkString(","))
  }
}
