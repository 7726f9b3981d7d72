package graft

import java.nio.file.Files
import java.util.Base64

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ArcPipeline

/** Full-system test of the reference dataflow: a directory-fed stream of
  * base64+gzip Arc payloads (the Kinesis stand-in) → ArcPipeline decode/
  * filter/project → tumbling-window aggregation → checkpointed parquet
  * sink. Exercises A1 (source) through A9 (sink) and B2 (window) in one
  * streaming query — the shape a production deployment of this engine
  * actually runs. */
class IntegrationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def gz(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g   = new java.util.zip.GZIPOutputStream(bos)
    g.write(s.getBytes("UTF-8")); g.close()
    bos.toByteArray
  }
  private def payload(json: String): String = Base64.getEncoder.encodeToString(gz(json))

  private def envelope(id: Int, typ: String, date: String): String =
    s"""{"version":"0.10.7","type":"$typ","operation":"insert","date":"$date","id":"e$id","body":{"_id":"d$id","headlines":{"basic":"h$id"},"taxonomy":{"sections":[{"_id":"news","name":"news"}]},"revision":{"published":true},"websites":{"site-a":{"website_url":"/$id"}}}}"""

  test("kinesis-sim: stream → decode → filter → window agg → checkpointed sink") {
    val srcDir = Files.createTempDirectory("graft_e2e_src")
    val ckpt   = Files.createTempDirectory("graft_e2e_ckpt").toString
    val outDir = Files.createTempDirectory("graft_e2e_out").toString

    // two "shard batches" as files: 6 stories + 2 redirects over 2 hours
    Files.writeString(srcDir.resolve("batch0.json"),
      (1 to 3).map(i => s"""{"payload": "${payload(envelope(i, "story", "2024-03-01T10:15:00Z"))}"}""").mkString("\n"))
    Files.writeString(srcDir.resolve("batch1.json"),
      ((4 to 6).map(i => s"""{"payload": "${payload(envelope(i, "story", "2024-03-01T11:45:00Z"))}"}""") ++
        (7 to 8).map(i => s"""{"payload": "${payload(envelope(i, "redirect", "2024-03-01T11:50:00Z"))}"}"""))
        .mkString("\n"))

    val schema = StructType(Seq(StructField("payload", StringType)))
    val stream = spark.readStream.schema(schema).json(srcDir.toString)

    val (projected, _) = ArcPipeline.run(stream, col("payload"), ArcPipeline.FilterConfig(
      allowedTypes = Seq("story", "video"), sectionAllowlist = Seq("news"), website = Some("site-a")))

    val windowed = projected
      .withWatermark("event_ts", "1 hour")
      .groupBy(window(col("event_ts"), "1 hour"), col("content_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("content_type"), col("cnt"))

    def runOnce(): Unit = {
      val q = windowed.writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000); q.stop()
    }
    def closed(): Set[(String, String, Long)] =
      spark.read.parquet(outDir).collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet

    runOnce() // ingest both batches; watermark persists to the checkpoint

    // restart with a later-hour batch: checkpointed watermark (10:50, from
    // max event time 11:50 - 1h) closes the 10:00 window this run.
    Files.writeString(srcDir.resolve("batch2.json"),
      Seq(s"""{"payload": "${payload(envelope(9, "story", "2024-03-01T13:30:00Z"))}"}""").mkString("\n"))
    runOnce()
    assert(closed().contains(("2024-03-01 10:00:00.0", "story", 3L)), closed().mkString(","))

    // one more advance (15:00) closes the 11:00 window.
    Files.writeString(srcDir.resolve("batch3.json"),
      Seq(s"""{"payload": "${payload(envelope(10, "story", "2024-03-01T15:00:00Z"))}"}""").mkString("\n"))
    runOnce()
    assert(closed().contains(("2024-03-01 11:00:00.0", "story", 3L)), closed().mkString(","))
    // redirects were filtered before ever reaching the window state
    assert(!closed().exists(_._2 == "redirect"))
  }

  test("KPL-aggregated feed: deaggregate → decode → filter equals the unaggregated pipeline") {
    import spark.implicits._
    // a producer that KPL-aggregates 3 Arc envelopes per Kinesis record
    // (gzipped, as Arc ships them); the consumer must unpack first —
    // A11 composed with the A3→A8 chain, the REAL reference topology
    val envs = (1 to 9).map(i =>
      envelope(i, if (i % 3 == 0) "redirect" else "story", "2024-03-01T10:15:00Z"))
    val aggs = envs.grouped(3).zipWithIndex.map { case (group, gi) =>
      (gi.toLong, graft.sources.Kpl.aggregate(group.map(e => (s"pk$gi", gz(e)))))
    }.toSeq
    val cfg = ArcPipeline.FilterConfig(
      allowedTypes = Seq("story", "video"), sectionAllowlist = Seq("news"),
      website = Some("site-a"))

    val users = graft.sources.Kpl
      .deaggregateRecords(aggs.toDF("agg_id", "payload"))
      .filter(col("decode_ok"))
      .select(col("data").as("payload"))
    val (out, dlq) = ArcPipeline.runRecords(users, cfg)

    // twin: the same envelopes fed unaggregated
    val (twin, _) = ArcPipeline.runRecords(
      envs.map(e => Tuple1(gz(e))).toDF("payload"), cfg)
    val got  = out.select(col("event_id")).as[String].collect().sorted.toSeq
    val want = twin.select(col("event_id")).as[String].collect().sorted.toSeq
    assert(got === want && got.size === 6, s"deaggregated pipeline diverged: $got vs $want")
    assert(dlq.count() === 0)
  }

  test("kinesis-sim over the DSv2 sharded connector: shard feed → decode → filter → sink, resume") {
    // The same reference dataflow, but the transport is the engine's own
    // DSv2 connector: shard dirs of raw payload lines, per-shard sequence
    // offsets, checkpoint resume picking up only the new shard file.
    val srcDir = Files.createTempDirectory("graft_e2e2_src")
    val ckpt   = Files.createTempDirectory("graft_e2e2_ckpt").toString
    val outDir = Files.createTempDirectory("graft_e2e2_out").toString

    def writeShardFile(shard: Int, name: String, payloads: Seq[String]): Unit = {
      val dir = srcDir.resolve(s"shard=$shard")
      Files.createDirectories(dir)
      Files.writeString(dir.resolve(name), payloads.mkString("\n"))
    }
    writeShardFile(0, "f0.txt",
      (1 to 3).map(i => payload(envelope(i, "story", "2024-03-01T10:15:00Z"))))
    writeShardFile(1, "f0.txt",
      Seq(payload(envelope(4, "story", "2024-03-01T10:20:00Z")),
          payload(envelope(5, "redirect", "2024-03-01T10:25:00Z"))))

    val fmt = classOf[graft.sources.sharded.ShardedStreamProvider].getName
    def runOnce(): Unit = {
      val stream = spark.readStream.format(fmt).option("path", srcDir.toString).load()
      val (projected, _) = ArcPipeline.run(stream, col("payload"), ArcPipeline.FilterConfig(
        allowedTypes = Seq("story", "video"), sectionAllowlist = Seq("news"), website = Some("site-a")))
      val q = projected.writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000); q.stop()
    }
    runOnce()
    def docs(): Seq[String] =
      spark.read.parquet(outDir).select("doc_id").collect().map(_.getString(0)).sorted.toSeq
    assert(docs() === Seq("d1", "d2", "d3", "d4")) // redirect d5 filtered

    // Resume: one new file in shard 0 — only its records flow.
    writeShardFile(0, "f1.txt",
      Seq(payload(envelope(6, "story", "2024-03-01T11:00:00Z"))))
    runOnce()
    assert(docs() === Seq("d1", "d2", "d3", "d4", "d6"), "resume re-read or missed records")
  }

  test("relay topology: sharded source → filter → sharded SINK → re-read, both directions DSv2") {
    // The complete reference deployment on the engine's own connector for
    // BOTH transports: consume a shard feed, filter, republish the
    // surviving payloads to a downstream shard feed (the Lambda's
    // put_records), then read the downstream feed back and check it holds
    // exactly the filtered records — shard-keyed, streaming end to end.
    val srcDir = Files.createTempDirectory("graft_relay_src")
    val dstDir = Files.createTempDirectory("graft_relay_dst").toString
    val ckpt   = Files.createTempDirectory("graft_relay_ckpt").toString

    def writeShardFile(shard: Int, name: String, payloads: Seq[String]): Unit = {
      val dir = srcDir.resolve(s"shard=$shard")
      Files.createDirectories(dir)
      Files.writeString(dir.resolve(name), payloads.mkString("\n"))
    }
    writeShardFile(0, "f0.txt",
      Seq(payload(envelope(1, "story", "2024-03-01T10:15:00Z")),
          payload(envelope(2, "redirect", "2024-03-01T10:16:00Z"))))
    writeShardFile(1, "f0.txt",
      Seq(payload(envelope(3, "story", "2024-03-01T10:20:00Z")),
          payload(envelope(4, "video", "2024-03-01T10:21:00Z"))))

    val fmt = classOf[graft.sources.sharded.ShardedStreamProvider].getName
    val stream = spark.readStream.format(fmt).option("path", srcDir.toString).load()
    val (projected, _) = ArcPipeline.run(stream, col("payload"), ArcPipeline.FilterConfig(
      allowedTypes = Seq("story", "video"), sectionAllowlist = Seq("news"), website = Some("site-a")))
    // Re-shard the survivors by doc id (the reference partition-keys its
    // put_records by document id) and republish the projected record as
    // a JSON payload line.
    val relayed = projected.select(
      pmod(xxhash64(col("doc_id")), lit(2)).cast("int").as("shard"),
      lit(0L).as("seq"),
      to_json(struct(col("doc_id"), col("content_type"))).as("payload"))
    val q = relayed.writeStream.format(fmt)
      .option("path", dstDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000); q.stop()

    val back = spark.read.format(fmt).option("path", dstDir).load()
      .select(col("shard"), get_json_object(col("payload"), "$.doc_id").as("doc_id"))
      .collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    // d2 (redirect) filtered out; d1/d3/d4 land on a valid hash shard.
    assert(back.map(_._2).sorted === Seq("d1", "d3", "d4"))
    assert(back.forall { case (shard, _) => shard == 0 || shard == 1 })
  }

  test("KPL relay: sharded stream → deaggregate → decode → filter → sharded sink; corrupt " +
      "aggregate dead-letters mid-stream; resume is exactly-once through the explode") {
    // The REAL Kinesis consumer topology end to end on the engine's own
    // transports: each source LINE is a base64'd KPL aggregate of three
    // gzipped Arc envelopes; the stream must unpack (A11), decode (A3–A5),
    // filter (A6), and republish survivors (A9) — with one corrupt
    // aggregate (flipped md5) dead-lettering as data, not an exception,
    // and a checkpoint restart republishing ONLY new user records (the
    // deagg explode must not double-emit on resume).
    val srcDir = Files.createTempDirectory("graft_kplrelay_src")
    val dstDir = Files.createTempDirectory("graft_kplrelay_dst").toString
    val dlqDir = Files.createTempDirectory("graft_kplrelay_dlq").toString
    val ckpt   = Files.createTempDirectory("graft_kplrelay_ckpt").toString
    val ckptD  = Files.createTempDirectory("graft_kplrelay_ckptd").toString

    def agg(ids: Seq[Int], typ: Int => String): Array[Byte] =
      graft.sources.Kpl.aggregate(ids.map(i =>
        (s"pk${i % 2}", gz(envelope(i, typ(i), "2024-03-01T10:15:00Z")))))
    def b64(b: Array[Byte]): String = Base64.getEncoder.encodeToString(b)
    def writeShardFile(shard: Int, name: String, lines: Seq[String]): Unit = {
      val dir = srcDir.resolve(s"shard=$shard")
      Files.createDirectories(dir)
      Files.writeString(dir.resolve(name), lines.mkString("\n"))
    }
    val corrupt = agg(Seq(97, 98, 99), _ => "story")
    corrupt(corrupt.length - 1) = (corrupt(corrupt.length - 1) ^ 0x5a).toByte // break the md5
    writeShardFile(0, "f0.txt", Seq(b64(agg(1 to 3, i => if (i == 2) "redirect" else "story"))))
    writeShardFile(1, "f0.txt", Seq(b64(agg(4 to 6, _ => "story")), b64(corrupt)))

    val fmt = classOf[graft.sources.sharded.ShardedStreamProvider].getName
    val cfg = ArcPipeline.FilterConfig(
      allowedTypes = Seq("story", "video"), sectionAllowlist = Seq("news"), website = Some("site-a"))
    def users() = graft.sources.Kpl.deaggregateRecords(
      spark.readStream.format(fmt).option("path", srcDir.toString).load()
        .select((col("shard").cast("long") * 1000000L + col("seq")).as("agg_id"),
          unbase64(col("payload")).as("payload")))
    def runOnce(): Unit = {
      // relay query: good user records through the Arc chain to the sink
      val (projected, _) = ArcPipeline.runRecords(
        users().filter(col("decode_ok")).select(col("data").as("payload")), cfg)
      val q = projected
        .select(pmod(xxhash64(col("doc_id")), lit(2)).cast("int").as("shard"),
          lit(0L).as("seq"), to_json(struct(col("doc_id"), col("content_type"))).as("payload"))
        .writeStream.format(fmt)
        .option("path", dstDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      // DLQ query: corrupt aggregates land as rows (A8 contract), own checkpoint
      val qd = users().filter(!col("decode_ok")).select(col("agg_id"))
        .writeStream.format("parquet")
        .option("path", dlqDir).option("checkpointLocation", ckptD)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
      qd.awaitTermination(120000); qd.stop()
    }
    runOnce()
    def docs(): Seq[String] = spark.read.format(fmt).option("path", dstDir).load()
      .select(get_json_object(col("payload"), "$.doc_id").as("d"))
      .collect().map(_.getString(0)).sorted.toSeq
    // aggregate 0: d1,d3 (d2 redirect filtered); aggregate 1: d4,d5,d6;
    // corrupt aggregate contributes NOTHING downstream, one DLQ row
    assert(docs() === Seq("d1", "d3", "d4", "d5", "d6"))
    val dlq = spark.read.parquet(dlqDir).collect().map(_.getLong(0)).toSeq
    assert(dlq === Seq(1000001L), s"corrupt aggregate did not dead-letter exactly once: $dlq")

    // resume: one NEW aggregate in shard 0 → exactly its survivors append
    writeShardFile(0, "f1.txt", Seq(b64(agg(Seq(7, 8), _ => "story"))))
    runOnce()
    assert(docs() === Seq("d1", "d3", "d4", "d5", "d6", "d7", "d8"),
      "checkpoint resume duplicated or dropped deaggregated records")
    assert(spark.read.parquet(dlqDir).count() === 1L, "DLQ re-emitted on resume")
  }

  test("relay resume: restart with new upstream data republishes ONLY the new records") {
    val srcDir = Files.createTempDirectory("graft_relay2_src")
    val dstDir = Files.createTempDirectory("graft_relay2_dst").toString
    val ckpt   = Files.createTempDirectory("graft_relay2_ckpt").toString

    def writeShardFile(shard: Int, name: String, payloads: Seq[String]): Unit = {
      val dir = srcDir.resolve(s"shard=$shard")
      Files.createDirectories(dir)
      Files.writeString(dir.resolve(name), payloads.mkString("\n"))
    }
    val fmt = classOf[graft.sources.sharded.ShardedStreamProvider].getName
    def runOnce(): Unit = {
      val stream = spark.readStream.format(fmt).option("path", srcDir.toString).load()
      val (projected, _) = ArcPipeline.run(stream, col("payload"), ArcPipeline.FilterConfig(
        allowedTypes = Seq("story"), sectionAllowlist = Seq("news"), website = Some("site-a")))
      val q = projected
        .select(lit(0).as("shard"), lit(0L).as("seq"),
          to_json(struct(col("doc_id"))).as("payload"))
        .writeStream.format(fmt)
        .option("path", dstDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000); q.stop()
    }
    writeShardFile(0, "f0.txt", Seq(payload(envelope(1, "story", "2024-03-01T10:00:00Z"))))
    runOnce()
    writeShardFile(0, "f1.txt", Seq(payload(envelope(2, "story", "2024-03-01T11:00:00Z"))))
    runOnce()
    val docs = spark.read.format(fmt).option("path", dstDir).load()
      .select(get_json_object(col("payload"), "$.doc_id").as("d"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(docs === Seq("d1", "d2"), s"resume duplicated or dropped records: $docs")
  }

  test("streaming epoch close-out: stream N batches → shards ≡ the batch pipeline's shards") {
    // The continuous half (streamingPrepare's incremental dedup/gate per
    // micro-batch) and the sink half (globalShuffle → writeTrainingShards)
    // are each proven; this pins the CONNECTING step: freezing an epoch of
    // accumulated micro-batch output must produce byte-for-byte the shard
    // rows the one-shot batch pipeline writes on the same data — the
    // micro-batch boundaries leave no trace in the training set.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.pipelines.CorpusPrep
    import graft.sources.Sinks
    implicit val sqlCtx = spark.sqlContext

    val longA = (1 to 20).map(i => s"tok$i").mkString(" ")
    val mk = (n: Int) => (1 to 20).map(i => s"b${n}tok$i").mkString(" ")
    // 3 micro-batches; batch 1 carries an exact dup of batch 0's doc and
    // batch 2 a within-batch dup, so the dedup genuinely acts mid-stream.
    val batches = Seq(
      Seq((1L, longA), (2L, mk(0))),
      Seq((11L, mk(1)), (12L, longA)),
      Seq((21L, mk(2)), (22L, mk(2)), (23L, mk(3))))
    val cfg = CorpusPrep.Config(
      minhash = graft.operators.Dedup
        .MinHashParams(numHashes = 64, numBands = 16, jaccardThreshold = 0.5),
      minTokens = 3,
      maxStopwordRatio = 0.95)

    val base = Files.createTempDirectory("graft_epoch").toString
    val mem  = MemoryStream[(Long, String)]
    val q = CorpusPrep
      .streamingPrepare(
        mem.toDF().toDF("doc_id", "text"),
        col("doc_id"), col("text"), s"$base/store", s"$base/out", s"$base/ckpt", cfg)
      .start()
    try batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    CorpusPrep.closeOutEpoch(
      spark, s"$base/out", col("doc_id"), s"$base/shards_stream", numShards = 4, seed = 13)
    val (batchPrepared, _) = CorpusPrep.prepare(
      batches.flatten.toDF("doc_id", "text"), col("doc_id"), col("text"), cfg)
    Sinks.writeTrainingShards(
      batchPrepared, col("doc_id"), s"$base/shards_batch", numShards = 4, seed = 13)

    val streamed = spark.read.parquet(s"$base/shards_stream")
    val batch    = spark.read.parquet(s"$base/shards_batch")
    assert(streamed.columns.sorted.toSeq === batch.columns.sorted.toSeq,
      "epoch shards carry different columns than batch shards")
    val cols = batch.columns.sorted.toIndexedSeq
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*).collect().map(_.toSeq).sortBy(_.toString)
    assert(rows(streamed) === rows(batch),
      "epoch close-out shards diverge from the batch pipeline's")
    // And the epoch genuinely deduped across micro-batches: 12 and 22 gone.
    val ids = streamed.select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L, 11L, 21L, 23L), ids.toString)
  }

  test("streaming ANN ingest: micro-batched addToIvfIndex ≡ one-shot build on the union") {
    // The incremental-add law (SimilaritySpec) covers one batch add; this
    // pins the STREAMING driver of it: embedding shards arriving as
    // micro-batches, appended to the live index via foreachBatch, must
    // leave an index whose probes are row-identical to one built from
    // the whole corpus against the SAME centroids — micro-batch
    // boundaries and arrival order leave no trace in search results.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.VectorOps
    import graft.operators.SimilarityJoin
    implicit val sqlCtx = spark.sqlContext

    val emb     = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val initial = emb.filter(col("vec_id") < 250)
    val rest = emb.filter(col("vec_id") >= 250)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val centroids = initial.filter(col("vec_id") % 37 === 1).orderBy("vec_id").limit(8)
      .select(col("vec_id").as("cid"), VectorOps.asDouble(col("embedding")).as("cvec"))
      .localCheckpoint()
    val base = Files.createTempDirectory("graft_stream_ivf").toString
    SimilarityJoin.buildIvfIndex(initial, col("vec_id"), col("embedding"), centroids, s"$base/live")

    val mem = MemoryStream[(Long, Array[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding")
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        SimilarityJoin.addToIvfIndex(df, col("vec_id"), col("embedding"), s"$base/live")
      }
      .start()
    try rest.grouped(100).foreach { b => mem.addData(b.toSeq: _*); q.processAllAvailable() }
    finally q.stop()

    SimilarityJoin.buildIvfIndex(emb, col("vec_id"), col("embedding"), centroids, s"$base/ref")
    Seq(0L, 42L, 300L, 499L).foreach { qid =>
      val qv = emb.filter(col("vec_id") === qid)
        .select(VectorOps.asDouble(col("embedding")).as("qvec"))
      val live = SimilarityJoin.ivfProbe(spark, s"$base/live", qv, k = 10, nprobe = 3)
        .collect().map(_.toSeq).toSeq
      val ref = SimilarityJoin.ivfProbe(spark, s"$base/ref", qv, k = 10, nprobe = 3)
        .collect().map(_.toSeq).toSeq
      assert(live === ref, s"streamed index diverged from one-shot build for query $qid")
    }
  }

  test("corpus → training shards: the full D-pipeline end to end") {
    // Every corpus-prep stage in one run, the way a production pipeline
    // composes them: dedup (exact + near) → eval decontamination → rule +
    // classifier + LM gates → temperature mixture sampling → chunking →
    // deterministic shuffle → sharded sink. Asserts the pipeline-level
    // contracts each stage's unit laws promise.
    import spark.implicits._
    import graft.operators.{LmScore, Mixture}
    import graft.pipelines.CorpusPrep
    import graft.sources.Sinks

    val docs  = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val eval_ = docs.filter(col("doc_id") % 10 === 0)
    val base  = docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "source", "text")
    // Plant a verbatim duplicate of a train doc and a verbatim copy of an
    // eval doc: dedup must remove the first, decontamination the second.
    val dupOf   = base.orderBy("doc_id").limit(1)
      .select(lit(9001L).as("doc_id"), col("source"), col("text"))
    val leaked  = eval_.orderBy("doc_id").limit(1)
      .select(lit(9002L).as("doc_id"), lit("crawl").as("source"), col("text"))
    val train = base.unionByName(dupOf).unionByName(leaked)

    val lm = LmScore.trainUnigram(docs, col("text"))
    val oovLp = lm.filter(col("token") === LmScore.OovToken)
      .select("lp_micro").as[Long].collect().head
    val cfg = CorpusPrep.Config(
      minhash = graft.operators.Dedup
        .MinHashParams(numHashes = 32, numBands = 16, jaccardThreshold = 0.5),
      minTokens = 3,
      maxStopwordRatio = 0.95,
      classifier = Some(CorpusPrep.QualityModel(Array(1.2, -1.5, 0.8, 2.0), -2.0, keepAbove = 0.0)),
      lmGate = Some(CorpusPrep.LmGate(lm, minMeanLpMicro = oovLp + 1)),
      decontam = Some(CorpusPrep.Decontam(eval_, col("doc_id"), col("text"), shingleSize = 3)))

    val (prepared, audit) = CorpusPrep.prepare(train, col("doc_id"), col("text"), cfg)
    val keptIds = prepared.select("doc_id").as[Long].collect().toSet
    assert(!keptIds.contains(9001L), "verbatim duplicate survived dedup")
    assert(!keptIds.contains(9002L), "leaked eval doc survived decontamination")
    assert(keptIds.nonEmpty)
    val counts = audit.counts
    assert(counts("exact_dedup") === counts("input") - 1, counts.toString)  // the planted dup
    assert(counts("decontam") < counts("near_dedup"), counts.toString)      // the planted leak

    // Mixture: temperature-flattened per-source budgets, then sample.
    val budgets = Mixture.temperatureBudgets(
      prepared, col("source"), col("n_tok"), temperature = 2.0, totalBudget = 2000L)
    val mixed = Mixture.sampleToTokenBudgets(
      prepared, col("doc_id"), col("source"), col("n_tok"),
      budgets.select("slice", "token_budget"))
    assert(mixed.count() > 0 && mixed.count() <= prepared.count())

    // Chunk to 32-token windows (stride 24), shuffle, write 4 shards.
    val chunks = Mixture.chunkDocuments(mixed, col("doc_id"), col("text"), 32, 24)
      .withColumn("row_id", col("doc_id") * 1000 + col("chunk_id"))
    val outDir = Files.createTempDirectory("graft_e2e_shards").toString
    Sinks.writeTrainingShards(chunks, col("row_id"), outDir, numShards = 4, seed = 13)

    val back = spark.read.parquet(outDir)
    assert(back.count() === chunks.count(), "sink lost or invented chunks")
    // every chunk's doc survived the gates, and no chunk exceeds the window
    assert(back.join(mixed.select("doc_id"), Seq("doc_id"), "left_anti").count() === 0)
    assert(back.agg(max("chunk_toks")).as[Long].collect().head <= 32L)
    // shard layout: 4 dirs, dense per-shard positions
    val perShard = back.groupBy("shard").agg(count(lit(1)).as("n"), max("pos").as("mx"))
      .as[(Int, Long, Long)].collect()
    assert(perShard.length === 4)
    perShard.foreach { case (s, n, mx) => assert(n === mx, s"shard $s positions not dense") }
  }

  test("medallion 3-hop: source → bronze store+feed → streaming CDF tail → silver IVM " +
      "— silver ≡ batch recompute at every epoch, across a mid-stream bucket split " +
      "and a killed-and-resumed consumer") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{Cdc, Ivm}
    import graft.sources.cdc.CdcCatalog
    implicit val sqlCtx = spark.sqlContext

    val store  = Files.createTempDirectory("graft_med_store").toString
    val feed   = Files.createTempDirectory("graft_med_feed").toString
    val ckptB  = Files.createTempDirectory("graft_med_ckptB").toString
    val ckptS  = Files.createTempDirectory("graft_med_ckptS").toString
    val silver = Files.createTempDirectory("graft_med_silver").toString
    val keys   = Seq("k")
    val seed   = (1L to 40L).map(k => (k, s"n$k", k * 1.0)).toDF("k", "name", "bal")

    val mem = MemoryStream[(Long, String, Double, Long, String)]
    def bronze(nBuckets: Int) = Cdc.maintainPartitionedSnapshot(
      mem.toDF().toDF("k", "name", "bal", "seq", "op"),
      seed, keys, Seq(col("seq")), col("op"), store, ckptB, nBuckets,
      feedPath = Some(feed))

    // Hop 2: the catalog feed table tailed as a stream, weighted into
    // Z-set deltas (insert/update_postimage +1, delete/update_preimage −1)
    CdcCatalog.registerFeed("med_feed", store, feed)
    def silverQuery() = Ivm.maintainView(
      spark.readStream.table("graft.med_feed")
        .withColumn("grp", col("k") % 5)
        .withColumn("w",
          when(col("_change_type").isin("insert", "update_postimage"), 1L).otherwise(-1L)),
      col("w"), col("bal"), Seq("grp"), silver, ckptS)

    // the silver consumer bootstraps from snapshot v0 (the feed starts at
    // v1), exactly like c38_cdc_feed_ivm's initial load
    def viewRows(state: org.apache.spark.sql.DataFrame): Map[Long, (Long, java.math.BigDecimal)] =
      state.select("grp", "cnt", "total").as[(Long, Long, java.math.BigDecimal)]
        .collect().map { case (g, c, t) => g -> ((c, t)) }.toMap
    def recompute(): Map[Long, (Long, java.math.BigDecimal)] = viewRows(Ivm.aggDelta(
      Cdc.readPartitionedSnapshot(spark, store).withColumn("grp", col("k") % 5),
      lit(1L), col("bal"), Seq("grp")))
    lazy val bootstrap = Ivm.aggDelta(
      Cdc.readPartitionedSnapshot(spark, store, Some(0L)).withColumn("grp", col("k") % 5),
      lit(1L), col("bal"), Seq("grp")).localCheckpoint()
    // bootstrap + RAW deltas in one merge: zero-elimination only after the
    // snapshot state joins the fold (Ivm.readDeltas scaladoc — a delta
    // whose pre+post images cancel in weight still moves the value)
    def silverNow(): Map[Long, (Long, java.math.BigDecimal)] =
      viewRows(Ivm.applyDelta(bootstrap, Ivm.readDeltas(spark, silver), Seq("grp")))

    try {
      // epoch A (v0: seed ∪ batch) + epoch B (v1, first feed version)
      val q1 = bronze(nBuckets = 8).start()
      try {
        mem.addData((1L, "a", 100.0, 1L, "U"), (41L, "new", 41.0, 2L, "I"), (5L, "x", 0.0, 3L, "D"))
        q1.processAllAvailable()
        mem.addData((2L, "b", 202.0, 4L, "U"), (7L, "gone", 0.0, 5L, "D"), (42L, "n2", 42.0, 6L, "I"))
        q1.processAllAvailable()
      } finally q1.stop()

      val s1 = silverQuery().start()
      try s1.processAllAvailable() finally s1.stop() // consumer KILLED here
      assert(silverNow() === recompute(), "silver ≠ recompute after epoch B")

      // mid-stream layout evolution: metadata-only bucket split 8 → 16
      // commits store v2 with NO content change
      Cdc.splitBuckets(spark, store)
      assert(Cdc.manifestVersions(spark, store).sorted === Seq(0L, 1L, 2L))

      // bronze resumes AFTER the split, at the split's bucket count: the
      // version reservation must skip the split's v2 (not stomp it), and
      // the feed must back-fill an EMPTY v2 so the tail stays contiguous
      val q2 = bronze(nBuckets = 16).start()
      try {
        mem.addData((3L, "c", 303.0, 7L, "U"), (41L, "upd", 410.0, 8L, "U"), (9L, "d9", 0.0, 9L, "D"))
        q2.processAllAvailable()
      } finally q2.stop()
      assert(Cdc.manifestVersions(spark, store).sorted === Seq(0L, 1L, 2L, 3L),
        "epoch C must commit v3 — reusing the split's version id corrupts the store")
      assert(spark.read.parquet(s"$feed/v=2").count() === 0L,
        "the split's back-filled feed version must exist and be empty")
      assert(spark.read.parquet(s"$feed/v=3").count() > 0L)

      // the killed consumer RESUMES across the split: v2 (empty) + v3,
      // exactly once
      val s2 = silverQuery().start()
      try s2.processAllAvailable() finally s2.stop()
      assert(silverNow() === recompute(), "silver ≠ recompute after the split + resume")

      // spot the retraction semantics really fired: group of key 41
      // (41 % 5 = 1) absorbed update 41.0 → 410.0 through pre+post images
      val g1 = silverNow()(1L)
      assert(g1 === recompute()(1L))
    } finally CdcCatalog.unregister("med_feed")
  }
}
