package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.{Dedup, LmScore}

/** The canonical LLM training-data preparation DAG, composed from the
  * engine's operators (north star: BASELINE.json — dedup, text analysis,
  * quality at 100 TB):
  *
  *   exact dedup → near-dup dedup (MinHash/LSH + connected components) →
  *   quality gate → language gate → enrichment (tokens, fingerprint,
  *   quality features)
  *
  * Every stage is a keyed shuffle or a narrow map; nothing touches the
  * driver. Near-dup survivors are chosen PER CLUSTER: verified pairs feed
  * [[Dedup.connectedComponents]] and the minimum doc id of each component
  * survives — the standard near-dup policy (one canonical doc per
  * transitive duplicate group), consistent with exact dedup's keep-lowest
  * rule. (Dropping the higher id of every pair independently — the round-3
  * policy — deletes docs whose only near-dup was itself deleted.)
  *
  * A real 100 TB corpus is not prepared in one batch: new crawl shards
  * arrive against an already-deduped store. [[signatures]] materializes the
  * per-doc dedup state (content hash + MinHash signature — fixed-size,
  * text-free) and [[prepareIncremental]] dedups a new shard against that
  * store without rescanning the corpus: exact matches drop on the stored
  * content hash; cross-shard near-dups drop on sketch-ESTIMATED Jaccard
  * (the store holds no text, so exact verification is impossible by
  * design — the estimate's ε-law is in MinHashSketchSpec). Within-shard
  * dedup runs the full exact-verify batch path.
  */
object CorpusPrep {

  /** Classifier quality gate: logistic σ(bias + w·f) over the feature
    * vector (saturating length, stopword ratio, mean token length / 10,
    * distinct-token ratio — the same features the rule gates threshold
    * on); docs scoring below `keepAbove` drop. The standard corpus-prep
    * stage AFTER the rule gates: rules catch degenerate text, the model
    * ranks the rest. Weights live in config (a retrained model is a
    * config swap); scoring is pure Column arithmetic via
    * [[TextOps.qualityScore]]. */
  final case class QualityModel(
      weights: Array[Double], // length 4, feature order as above
      bias: Double,
      keepAbove: Double
  ) {
    require(weights.length == 4, s"expected 4 feature weights, got ${weights.length}")
  }

  /** CCNet-style perplexity gate: docs whose MEAN token log-prob against
    * `lm` (an [[LmScore.trainUnigram]]-shaped (token, lp_micro) frame —
    * a model trained on a clean reference corpus) falls below
    * `minMeanLpMicro` drop as out-of-distribution (gibberish, wrong
    * language, boilerplate soup). The LM is DATA: retraining or swapping
    * the reference corpus changes no code. Scoring is the NARROW
    * [[LmScore.asMapRow]] form — one broadcast vocab map, a pure Column
    * fold over the already-computed token array, zero added shuffles —
    * and the threshold compare is integer-exact
    * (lp_sum ≥ minMeanLpMicro · n_tok, no division). */
  final case class LmGate(
      lm: DataFrame,
      minMeanLpMicro: Long
  )

  /** Eval-set decontamination stage: drop every surviving train doc that
    * shares more than `maxHits` verbatim `shingleSize`-gram(s) with
    * `evalDf` — the GPT-3/PaLM rule, run where every production pipeline
    * runs it: inside corpus prep, before the corpus ships. Mechanics are
    * [[Dedup.exactNgramDecontam]] (broadcast eval shingle universe, one
    * pass over the survivors) followed by an anti-join on the flagged
    * ids. `maxHits = 0` (default) drops on any hit. */
  final case class Decontam(
      evalDf: DataFrame,
      evalId: Column,
      evalText: Column,
      shingleSize: Int = 13,
      maxHits: Long = 0L
  )

  /** Duplicated-SPAN removal stage (Lee et al. "ExactSubstr" — see
    * [[Dedup.duplicateSpanRemoval]]): after doc-grain dedup has kept one
    * copy of duplicated DOCUMENTS, this cuts duplicated PASSAGES out of
    * the survivors' text. The stage REWRITES `textName` in place
    * (whitespace/case-normalized rebuild), so every later stage — token
    * gates, classifier, LM gate, enrichment — sees the cleaned text, and
    * remnants that fall under `minTokens` are gated exactly like any
    * other short doc. k defaults to the usual ~50-BPE-token rule scaled
    * to whitespace tokens. */
  final case class SpanDedup(
      k: Int = 25,
      textName: String = "text"
  )

  final case class Config(
      minhash: Dedup.MinHashParams = Dedup.MinHashParams(jaccardThreshold = 0.8),
      minTokens: Int = 5,
      maxStopwordRatio: Double = 0.9,
      langAllowlist: Seq[String] = Seq.empty, // empty = keep all
      // Fold the signature store's delta log every N micro-batches
      // (0 = never). Without compaction the delta-log grows one directory
      // per micro-batch FOREVER, and readStore's per-batch listing + the
      // small-file reads become the bottleneck at 100 TB-scale batch
      // counts (VERDICT r4 missing-3).
      compactEvery: Int = 0,
      // None = rule gates only. Some(model) adds the classifier gate and
      // a `quality` column to the enriched output.
      classifier: Option[QualityModel] = None,
      // None = no LM gate. Some(gate) drops out-of-distribution docs and
      // adds a `mean_lp_micro` column to the enriched output.
      lmGate: Option[LmGate] = None,
      // Largest vocab the LM gate may pack into LmScore.asMapRow's
      // single-row broadcast map; above it the gate automatically falls
      // back to the exploded score() join (same result — LmScoreSpec law —
      // but the vocab ships as ordinary distributed rows instead of one
      // row-size-ceiling-bound map).
      lmMapMaxVocab: Long = LmScore.DefaultMaxMapVocab,
      // None = no decontamination. Some(d) drops train docs sharing
      // verbatim k-grams with the eval frame (audit stage "decontam").
      decontam: Option[Decontam] = None,
      // None = no span-grain dedup. Some(s) cuts duplicated passages out
      // of the surviving docs' text (audit stage "span_dedup").
      spanDedup: Option[SpanDedup] = None
  )

  /** Per-stage row counts, collected as OBSERVED METRICS of the pipeline's
    * own execution instead of separate counting queries: through round 6
    * the audit was a union of one `agg(count)` per stage, so materializing
    * it re-executed every stage subtree — a second full corpus pass just
    * to learn how many rows each gate dropped (VERDICT r6 §wrong-1).
    * `CollectMetrics` nodes woven into the single plan make the counts a
    * free by-product of the run.
    *
    * Stages whose frames are eagerly checkpointed inside
    * [[CorpusPrep.prepare]] / [[CorpusPrep.prepareIncremental]] have their
    * counts already resolved when this object is returned; the remaining
    * stages resolve when the caller materializes the prepared frame.
    * [[counts]] therefore BLOCKS until that first action — run the
    * pipeline, then read the audit. */
  final class PrepAudit private[pipelines] (stages: Seq[(String, Observation)]) {
    /** stage name → surviving row count. Call AFTER the prepared frame's
      * first action (write/collect/count); blocks until then. */
    def counts: Map[String, Long] =
      stages.map { case (st, o) => st -> o.get("n").asInstanceOf[Long] }.toMap
  }

  private def observed(df: DataFrame): (DataFrame, Observation) = {
    val o = Observation()
    (df.observe(o, count(lit(1)).as("n")), o)
  }

  /** Returns (surviving corpus with features, per-stage audit).
    *
    * Scheduling (the 100 TB cost shape, VERDICT r6 §wrong-1): the
    * exact-dedup output feeds BOTH near-dup pair generation AND the final
    * cluster-loser anti-join, so without a materialization boundary the
    * corpus scan + content-hash shuffle execute twice per run. The exact
    * stage is therefore eagerly `localCheckpoint`ed — one corpus pass,
    * one executor-local write, and every downstream consumer (including
    * the audit's count) reads the checkpoint. Same durability trade as
    * [[Dedup.connectedComponents]]'s internal round checkpoints: a lost
    * executor fails the job loudly instead of recomputing silently; on a
    * multi-executor cluster prefer a reliable checkpoint dir. Blocks are
    * freed by Spark's ContextCleaner once the caller drops the frame. */
  def prepare(docs: DataFrame, idCol: Column, textCol: Column, cfg: Config): (DataFrame, PrepAudit) = {
    val (docsObs, oIn) = observed(docs)

    // 1. exact dedup, keep-lowest-id. Eager checkpoint: dual-consumed below.
    val (exactObs, oExact) = observed(Dedup.exact(docsObs, textCol, idCol).drop("content_hash"))
    val exact = exactObs.localCheckpoint()

    // 2. near-dup dedup: one canonical (minimum-id) survivor per connected
    // cluster of verified pairs.
    val (deduped, oNear) =
      observed(dropNearDupClusterLosers(exact, idCol, textCol, cfg.minhash))

    // 2b. optional eval-set decontamination. The dedup output is
    // dual-consumed here (hit generation + the anti-join's left side), so
    // it gets the same eager checkpoint treatment as the exact stage —
    // without it the whole near-dup subtree would execute twice.
    val (decontamed, oDecon) = cfg.decontam match {
      case None => (deduped, None)
      case Some(d) =>
        val survivors = deduped.localCheckpoint()
        val flagged = Dedup
          .exactNgramDecontam(
            survivors, idCol, textCol, d.evalDf, d.evalId, d.evalText, d.shingleSize)
          .filter(col("n_hits") > d.maxHits)
          .select(col("train_id").as("__contaminated"))
        val (clean, o) =
          observed(survivors.join(flagged, idCol === col("__contaminated"), "left_anti"))
        (clean, Some(o))
    }

    // 2c. optional duplicated-span removal: rewrite the surviving text
    // with repeated passages cut (decontam ran on the ORIGINAL text — the
    // verbatim-k-gram eval rule must see what was crawled, not what span
    // dedup left behind). The input is dual-consumed by the operator's
    // window-generation and rebuild branches, so checkpoint it; the gates
    // then see the cleaned text and drop sub-minTokens remnants normally.
    val (spanned, oSpan) = cfg.spanDedup match {
      case None => (decontamed, None)
      case Some(sd) =>
        val cur = decontamed.localCheckpoint()
        val spans = Dedup
          .duplicateSpanRemoval(cur, idCol, textCol, sd.k)
          .select(col("doc_id").as("__sd_id"), col("clean_text"))
        val (clean, o) = observed(
          cur
            .join(spans, idCol === col("__sd_id"))
            .withColumn(sd.textName, col("clean_text"))
            .drop("__sd_id", "clean_text"))
        (clean, Some(o))
    }

    val (enriched, oGated) = observed(enrichAndGate(spanned, idCol, textCol, cfg))

    val audit = new PrepAudit(
      Seq("input" -> oIn, "exact_dedup" -> oExact, "near_dedup" -> oNear) ++
        oDecon.map("decontam" -> _) ++ oSpan.map("span_dedup" -> _) ++
        Seq("gated" -> oGated))
    (enriched, audit)
  }

  /** Per-doc dedup-state store row: (doc_id, content_hash, sig). Fixed-size
    * and text-free — ~300 bytes/doc regardless of document length, so the
    * store for a 100 TB corpus is a few hundred GB of parquet, scanned once
    * per incoming shard. Signatures are the same xxhash64-shingle MinHash
    * the batch LSH path uses (bit-identical: TextOps.shingleHashesJvm). */
  def signatures(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      p: Dedup.MinHashParams = Dedup.MinHashParams()
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        idCol.cast("long").as("doc_id"),
        sha2(textCol, 256).as("content_hash"),
        textCol.cast("string").as("__text"))
      .as[(Long, String, String)]
      .filter(_._3 != null)
      .map { case (id, h, t) =>
        (id, h, TextOps.minHashSignature64(TextOps.shingleHashesJvm(t, p.shingleSize), p.numHashes))
      }
      .toDF("doc_id", "content_hash", "sig")
  }

  /** Incremental corpus prep: dedup `newDocs` against an existing
    * [[signatures]] store WITHOUT rescanning the corpus, then gate and
    * enrich the survivors exactly like [[prepare]].
    *
    * Returns (enriched survivors, audit, store DELTA — the signature rows
    * this shard ADDS). The delta holds the PRE-GATE survivors' signatures —
    * matching the batch pipeline, where near-dup dedup runs before the
    * quality gates, so a doc gated out for quality still suppresses its
    * future near-dups. Returning the delta (not `store ∪ delta`) is the
    * 100 TB shape: the caller appends a small file instead of rewriting a
    * corpus-sized store ([[streamingPrepare]] writes one delta directory
    * per micro-batch, idempotently).
    *
    * Stages (all keyed shuffles; the store never needs the old text):
    *  1. exact-dup vs store: anti-join on content_hash.
    *  2. exact-dup within the shard: keep-lowest-id per content_hash.
    *  3. near-dup vs store: LSH band join (new sigs × store sigs) generates
    *     candidates; sketch-estimated Jaccard ≥ threshold drops the new doc.
    *  4. near-dup within the shard: the batch path (exact verify + connected
    *     components, minimum id survives).
    */
  def prepareIncremental(
      newDocs: DataFrame,
      idCol: Column,
      textCol: Column,
      sigStore: DataFrame,
      cfg: Config
  ): (DataFrame, PrepAudit, DataFrame) = {
    val p = cfg.minhash
    val (docsObs, oIn) = observed(newDocs)

    // Dual-consumed (cross-shard band join + store delta) and expensive
    // (full shard scan + JVM MinHash): checkpoint once. Fixed-size rows —
    // the checkpoint is ~300 B/doc, not the shard text.
    val newSigs = signatures(docsObs, idCol, textCol, p).localCheckpoint()

    // 1+2. exact dedup: within-shard keep-lowest, then drop hashes the
    // store already holds. One shuffle on content_hash each. Checkpointed:
    // consumed by the band-join's survivor filter AND the store anti-join.
    val (shardExactObs, oExact) = observed(
      Dedup
        .exact(docsObs, textCol, idCol)
        .join(sigStore.select(col("content_hash")).distinct(), Seq("content_hash"), "left_anti")
        .drop("content_hash"))
    val shardExact = shardExactObs.localCheckpoint()

    // 3. near-dup vs store: band keys on both sides (derived from the sig
    // column — the store persists signatures only), equi-join on
    // (band, bucket), estimate Jaccard from signature agreement
    // ([[crossStoreLosers]], shared with the oracle-artifact replay).
    val crossShardLosers =
      crossStoreLosers(newSigs, shardExact.select(idCol.cast("long").as("doc_id")), sigStore, p)
    // Checkpointed: dropNearDupClusterLosers consumes it twice (pair
    // generation + the final anti-join) — without the boundary the store
    // band join above would re-execute.
    val (afterStoreObs, oStore) = observed(
      shardExact.join(crossShardLosers, idCol === col("__loser"), "left_anti"))
    val afterStore = afterStoreObs.localCheckpoint()

    // 4. near-dup within the shard: full batch machinery (text available).
    // Checkpointed: feeds both the enriched output and the store delta,
    // which callers materialize as separate actions (processBatch writes
    // each to its own directory).
    val (dedupedObs, oNear) =
      observed(dropNearDupClusterLosers(afterStore, idCol, textCol, p))
    val deduped = dedupedObs.localCheckpoint()

    // Optional decontamination — same stage order as [[prepare]] (after
    // near-dedup, before the gates). The store delta stays PRE-decontam,
    // matching the pre-gate convention: a removed contaminated doc still
    // suppresses its future near-dups (which would share its k-grams and
    // be contaminated themselves). `deduped` is already a checkpoint, so
    // the dual consumption (hit generation + anti-join) is one scan.
    val (decontamed, oDecon) = cfg.decontam match {
      case None => (deduped, None)
      case Some(d) =>
        val flagged = Dedup
          .exactNgramDecontam(
            deduped, idCol, textCol, d.evalDf, d.evalId, d.evalText, d.shingleSize)
          .filter(col("n_hits") > d.maxHits)
          .select(col("train_id").as("__contaminated"))
        val (clean, o) =
          observed(deduped.join(flagged, idCol === col("__contaminated"), "left_anti"))
        (clean, Some(o))
    }

    val (enriched, oGated) = observed(enrichAndGate(decontamed, idCol, textCol, cfg))
    val storeDelta =
      newSigs.join(deduped.select(idCol.cast("long").as("doc_id")), "doc_id")

    val audit = new PrepAudit(
      Seq("input" -> oIn, "exact_dedup" -> oExact, "store_dedup" -> oStore,
        "near_dedup" -> oNear) ++ oDecon.map("decontam" -> _) ++ Seq("gated" -> oGated))
    (enriched, audit, storeDelta)
  }

  /** The signature-store schema ([[signatures]] output). */
  val storeSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content_hash", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(
        "sig",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))))

  /** Read a delta-log signature store: the union of every micro-batch's
    * `delta=N` directory (empty frame with the right schema when the store
    * does not exist yet).
    *
    * `beforeBatch`: when set, only deltas with id < beforeBatch are read.
    * This is the REPLAY guard for [[streamingPrepare]]: a micro-batch that
    * crashed after writing its delta but before the checkpoint committed
    * is re-run with the same id — if the re-run read its own (or any
    * later) delta, every one of its documents would match its own stored
    * signature and be dropped as a "duplicate": silent data loss on
    * exactly the path that is supposed to be exactly-once. */
  def readStore(
      spark: org.apache.spark.sql.SparkSession,
      storePath: String,
      beforeBatch: Option[Long] = None): DataFrame = {
    val p  = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deltas =
      if (!fs.exists(p)) Array.empty[String]
      else
        fs.listStatus(p)
          .map(_.getPath)
          .filter(_.getName.startsWith("delta="))
          .filter(d => beforeBatch.forall(b => d.getName.stripPrefix("delta=").toLong < b))
          // torn-write guard (same as Ivm.readView / Cdc store): a delta
          // written by a crashed batch has no _SUCCESS marker and must be
          // invisible — its checkpoint replay rewrites it whole
          .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d, "_SUCCESS")))
          .map(_.toString)
    if (deltas.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], storeSchema)
    else
      spark.read.schema(storeSchema).parquet(deltas.toIndexedSeq: _*)
  }

  /** CONTINUOUS corpus prep: each micro-batch of arriving documents is
    * deduped against the persistent signature store, survivors land in
    * `outPath/batch=N`, and the store grows by `storePath/delta=N` — both
    * writes are overwrite-by-batch-directory, so a replayed micro-batch
    * (crash between commit points) rewrites the same directories instead
    * of duplicating rows: exactly-once output on top of the checkpoint's
    * at-least-once replay, the same contract as
    * [[graft.sources.Sinks.streamWithDeadLetter]].
    *
    * 100 TB notes: the store is append-only (one small delta per batch);
    * with `cfg.compactEvery > 0`, [[processBatch]] folds the delta log via
    * [[compactStore]] on that cadence, so the directory count — and with
    * it readStore's listing and small-file read cost — stays bounded
    * instead of growing with stream lifetime. Each batch's work is the
    * [[prepareIncremental]] plan — hash/band joins against the store,
    * never a corpus rescan. */
  def streamingPrepare(
      newDocs: DataFrame,
      idCol: Column,
      textCol: Column,
      storePath: String,
      outPath: String,
      checkpoint: String,
      cfg: Config): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, idCol, textCol, storePath, outPath, id, cfg)
      }

  /** One micro-batch of [[streamingPrepare]], exposed for replay testing:
    * dedup `batch` against the store AS OF batch `id` (deltas < id only —
    * see [[readStore]]'s replay guard), then idempotently overwrite this
    * batch's output and delta directories. */
  def processBatch(
      batch: DataFrame,
      idCol: Column,
      textCol: Column,
      storePath: String,
      outPath: String,
      id: Long,
      cfg: Config): Unit = {
    val spark                = batch.sparkSession
    val store                = readStore(spark, storePath, beforeBatch = Some(id))
    val (enriched, _, delta) = prepareIncremental(batch, idCol, textCol, store, cfg)
    enriched.write.mode("overwrite").parquet(s"$outPath/batch=$id")
    delta.write.mode("overwrite").parquet(s"$storePath/delta=$id")
    if (cfg.compactEvery > 0 && id > 0 && id % cfg.compactEvery == 0)
      compactStore(spark, storePath)
  }

  /** Freeze an EPOCH of the stream into training shards: read every
    * micro-batch directory [[streamingPrepare]] accumulated under
    * `outPath` (`batch=N`, one per processed micro-batch), apply
    * [[graft.operators.Mixture.globalShuffle]]'s deterministic
    * permutation, and write `numShards` training shards to `shardPath`
    * via [[graft.sources.Sinks.writeTrainingShards]] — the close-out step
    * that connects the continuous-prep half to the training-data sink:
    * documents arrive and dedup/gate incrementally for as long as the
    * stream runs, then one batch job freezes what accumulated into the
    * shard layout a trainer consumes.
    *
    * Epoch ≡ batch: the shuffle key is pure modular arithmetic on the doc
    * id, so the shard files equal the ones the one-shot batch pipeline
    * ([[prepare]] → writeTrainingShards) would produce on the same
    * surviving documents — micro-batch boundaries leave no trace
    * (IntegrationSpec law). Stop (or quiesce) the stream first: the read
    * lists `batch=*` once at job start, so a concurrently-committing
    * micro-batch is either wholly in or wholly out, but a batch id
    * REPLAYED after the close-out would not be re-read.
    *
    * Cost shape: one scan of the accumulated survivors + the one
    * deliberately-paid full shuffle every training run needs anyway
    * (per-shard window sorts, never a global single-partition sort). The
    * micro-batch partition column is dropped — shard files carry exactly
    * what the batch pipeline's would. */
  def closeOutEpoch(
      spark: org.apache.spark.sql.SparkSession,
      outPath: String,
      idCol: Column,
      shardPath: String,
      numShards: Int,
      seed: Long): Unit =
    graft.sources.Sinks.writeTrainingShards(
      spark.read.parquet(outPath).drop("batch"),
      idCol, shardPath, numShards, seed)

  /** Fold the store's delta log: every delta directory EXCEPT the one with
    * the maximum batch id is unioned and rewritten as a single
    * `delta=<max folded id>` directory; the folded originals are removed.
    * [[readStore]] semantics are preserved exactly:
    *
    *  - The union of deltas is unchanged, so full reads are identical.
    *  - The replay guard survives: only batch ids that can still replay
    *    matter, and after batch B's delta exists those are ids >= B (a
    *    foreachBatch replays at most the newest uncommitted batch). The
    *    newest delta is therefore NEVER folded — a replay of its batch id
    *    must not see it — and every folded id F < B keeps satisfying
    *    `F < id` for any replayable id, so compacted data stays visible to
    *    exactly the reads that saw it before.
    *
    * Crash safety mirrors [[graft.sources.Sinks.compact]]: the folded
    * union is fully written to a temp directory first, originals are
    * renamed aside to `__precompact` before the swap, and the aside copy
    * is deleted last — a crash mid-swap leaves a recoverable copy, at the
    * cost of a brief window where concurrent readers miss the folded rows
    * (schedule compaction from the single writer, which processBatch is).
    *
    * No-op when the store has fewer than 3 deltas (nothing worth folding
    * or the only foldable delta is already compact). */
  def compactStore(spark: org.apache.spark.sql.SparkSession, storePath: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(storePath)
    val fs   = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val deltas = fs
      .listStatus(root)
      .map(_.getPath)
      .filter(_.getName.startsWith("delta="))
      .map(p => p.getName.stripPrefix("delta=").toLong -> p)
      .sortBy(_._1)
    if (deltas.length < 3) return
    val fold    = deltas.dropRight(1) // newest delta may still replay — keep it
    val foldMax = fold.last._1
    val tmp     = new Path(s"$storePath/__compact_tmp")
    val aside   = new Path(s"$storePath/__precompact")
    fs.delete(tmp, true)
    fs.delete(aside, true)
    spark.read
      .schema(storeSchema)
      .parquet(fold.map(_._2.toString).toIndexedSeq: _*)
      .write
      .mode("overwrite")
      .parquet(tmp.toString)
    fs.mkdirs(aside)
    fold.foreach { case (idN, p) =>
      if (!fs.rename(p, new Path(aside, p.getName)))
        throw new java.io.IOException(s"store compaction: rename-aside failed for delta=$idN")
    }
    if (!fs.rename(tmp, new Path(s"$storePath/delta=$foldMax")))
      throw new java.io.IOException(
        s"store compaction: swap failed — folded deltas preserved under $aside, rewrite under $tmp")
    fs.delete(aside, true)
    ()
  }

  /** The doc ids the near-dup cluster stage drops from `docs` (every
    * cluster member except the minimum id) — the xxhash-determined half of
    * [[prepare]], exposed as a standalone frame so a session can
    * MATERIALIZE it as a parquet artifact and an external oracle can
    * replay every deterministic stage around it (exact dedup, decontam,
    * span dedup, gates) from the documents table alone, the same contract
    * as the d4 index artifacts. Replay ≡ pipeline law in CorpusPrepSpec. */
  def nearDupLoserIds(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      p: Dedup.MinHashParams
  ): DataFrame = {
    val pairs = Dedup
      .nearDuplicatePairs(docs, idCol, textCol, p)
      .select(col("doc_a"), col("doc_b"))
    Dedup
      .connectedComponents(pairs)
      .filter(col("node") =!= col("cluster")) // survivors: node == cluster min
      .select(col("node").as("doc_id"))
  }

  /** The combined loser-id set of [[prepareIncremental]]'s TWO xxhash
    * stages — cross-store sketch losers (stage 3) plus within-shard
    * cluster losers (stage 4) — replayed over the same inputs the pipeline
    * sees (the deterministic exact-dedup + store-hash stages are rebuilt
    * here; they are pure sha-256 set algebra, so an external oracle can
    * rebuild them too and apply this one artifact for the rest). */
  def incrementalNearDupLoserIds(
      newDocs: DataFrame,
      idCol: Column,
      textCol: Column,
      sigStore: DataFrame,
      p: Dedup.MinHashParams
  ): DataFrame = {
    val newSigs = signatures(newDocs, idCol, textCol, p)
    val shardExact = Dedup
      .exact(newDocs, textCol, idCol)
      .join(sigStore.select(col("content_hash")).distinct(), Seq("content_hash"), "left_anti")
      .drop("content_hash")
      .localCheckpoint() // dual-consumed: cross-store filter + stage-4 input
    val cross = crossStoreLosers(
      newSigs, shardExact.select(idCol.cast("long").as("doc_id")), sigStore, p)
      .localCheckpoint() // dual-consumed: anti-join + the returned union
    val afterStore = shardExact.join(cross, idCol === col("__loser"), "left_anti")
    cross
      .select(col("__loser").as("doc_id"))
      .union(nearDupLoserIds(afterStore, idCol, textCol, p))
      .distinct()
  }

  /** Stage 3 of [[prepareIncremental]]: new-shard docs whose sketch-
    * estimated Jaccard against ANY stored signature in a shared LSH band
    * bucket clears the threshold. Shared with
    * [[incrementalNearDupLoserIds]] so the materialized oracle artifact
    * and the pipeline compute the set from one code path. */
  private def crossStoreLosers(
      newSigs: DataFrame,
      survivorIds: DataFrame,
      sigStore: DataFrame,
      p: Dedup.MinHashParams
  ): DataFrame = {
    def banded(sigs: DataFrame, idAs: String, sigAs: String) =
      sigs
        .select(col("doc_id").as(idAs), col("sig").as(sigAs))
        .withColumn("__bands", TextOps.bandKeys(col(sigAs), p.numBands, p.rowsPerBand))
        .select(col(idAs), col(sigAs), posexplode(col("__bands")).as(Seq("band", "bucket")))
    banded(newSigs.join(survivorIds, "doc_id"), "new_id", "new_sig")
      .join(banded(sigStore, "store_id", "store_sig"), Seq("band", "bucket"))
      .select(col("new_id"), col("new_sig"), col("store_id"), col("store_sig"))
      .distinct()
      .filter(
        graft.functions.MinHashSketch
          .estimateJaccardNative(newSigs.sparkSession, col("new_sig"), col("store_sig"))
          >= p.jaccardThreshold)
      .select(col("new_id").as("__loser"))
      .distinct()
  }

  /** Near-dup stage shared by the batch and incremental paths: verified
    * pairs → connected components → keep the minimum id per cluster. */
  private def dropNearDupClusterLosers(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      p: Dedup.MinHashParams
  ): DataFrame = {
    val losers = nearDupLoserIds(docs, idCol, textCol, p).select(col("doc_id").as("__loser"))
    docs.join(losers, idCol === col("__loser"), "left_anti")
  }

  /** Rule gates (+ optional classifier gate) and enrichment — one narrow
    * pass; rules run first so the model scores only plausible text. */
  private def enrichAndGate(docs: DataFrame, idCol: Column, textCol: Column, cfg: Config): DataFrame = {
    val gated = docs
      .withColumn("toks", TextOps.tokens(textCol))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("stop_ratio", TextOps.stopwordRatio(col("toks")))
      .withColumn("pred_lang", TextOps.langId(col("toks")))
      .withColumn("fp", TextOps.fingerprint(col("toks")))
      .filter(col("n_tok") >= cfg.minTokens && col("stop_ratio") <= cfg.maxStopwordRatio)
      .filter(
        if (cfg.langAllowlist.isEmpty) lit(true)
        else col("pred_lang").isin(cfg.langAllowlist: _*)
      )
    val scored = cfg.classifier.fold(gated) { m =>
      val features = array(
        least(col("n_tok").cast("double") / 100.0, lit(1.0)),
        col("stop_ratio"),
        TextOps.meanTokenLength(col("toks")) / 10.0,
        size(array_distinct(col("toks"))).cast("double") /
          nullif(size(col("toks")), lit(0)).cast("double"))
      gated
        .withColumn(
          "quality",
          TextOps.qualityScore(
            features,
            array(m.weights.toIndexedSeq.map(lit): _*),
            lit(m.bias)))
        .filter(col("quality") >= m.keepAbove)
    }
    // LM (perplexity-proxy) gate: narrow broadcast-map scoring over the
    // existing token array; integer-exact mean threshold (no division).
    // The map form has a single-row size ceiling, so vocabs above
    // cfg.lmMapMaxVocab fall back to the exploded score() join — same
    // survivors and mean_lp_micro (LmScoreSpec/CorpusPrepSpec laws), the
    // vocab just ships as distributed rows instead of one map row.
    val lmGated = cfg.lmGate.fold(scored) { g =>
      // Counted here AND aggregated below: checkpoint bounds a lazy
      // trainUnigram plan to one training pass (asMapRow/score re-
      // checkpoint a checkpoint, which is vocab-sized and free-ish).
      val lmOnce = g.lm.localCheckpoint()
      val vocab  = lmOnce.filter(col("token") =!= LmScore.OovToken).count()
      val withSum =
        if (vocab <= cfg.lmMapMaxVocab)
          scored
            .crossJoin(broadcast(LmScore.asMapRow(lmOnce, cfg.lmMapMaxVocab)))
            .withColumn(
              "__lp_sum",
              LmScore.lpSumMicro(col("toks"), col("__lm_map"), col("__oov_lp")))
            .drop("__lm_map", "__oov_lp")
        else {
          // Dual consumption (score input + join left side): checkpoint so
          // the upstream dedup/gate subtree executes once, per the
          // pipeline-wide rule.
          val base = scored.localCheckpoint()
          base.join(
            LmScore
              .score(base, idCol, textCol, lmOnce)
              .select(col("doc_id").as("__lm_id"), col("lp_sum").as("__lp_sum")),
            idCol === col("__lm_id"))
            .drop("__lm_id")
        }
      withSum
        .filter(col("__lp_sum") >= lit(g.minMeanLpMicro) * col("n_tok"))
        // greatest guards ANSI div-by-zero when minTokens is configured 0
        .withColumn("mean_lp_micro", (col("__lp_sum") / greatest(col("n_tok"), lit(1L))).cast("long"))
        .drop("__lp_sum")
    }
    lmGated.drop("toks")
  }
}
