package graft.sources.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Cdc

/** Laws for FEED LOG COMPACTION ([[Cdc.compactFeed]] — Kafka-style
  * segment coalescing over the materialized CDF):
  *  - compaction preserves the feed exactly: batch reads and a fresh
  *    from-oldest tail serve IDENTICAL rows (payload, `_change_type`,
  *    `_commit_version`, `_commit_timestamp`) before and after, while a
  *    deep-history replay opens a BOUNDED file count (one per segment,
  *    not one directory per epoch);
  *  - a segment is the atomic replay unit: admission control ships it
  *    whole; `startingVersion` inside one is loud; a checkpoint that
  *    compaction ran past resumes loudly (never double-serves);
  *  - `readFeedSince` stays exact across segment boundaries (residual
  *    `_commit_version` filtering trims the over-read);
  *  - vacuum prunes whole segments behind the retention floor, never
  *    straddling ones;
  *  - re-running compaction after a simulated crash converges.
  */
class CdcFeedCompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keys = Seq("k")
  private val n = 4

  /** Store + feed with `versions` single-row epochs (v=1..versions; v=0
    * seeds and has no feed entry), deterministic commit clocks. */
  private def build(versions: Int): (String, String) = {
    val store = java.nio.file.Files.createTempDirectory("graft_cmp_store").toString
    val feed = java.nio.file.Files.createTempDirectory("graft_cmp_feed").toString
    val seed = (1L to 10L).map(k => (k, s"orig$k")).toDF("k", "name")
    val empty = seed.limit(0)
    Cdc.processPartitionedBatch(
      Seq((1L, "b0", 0L, "U")).toDF("k", "name", "seq", "op"),
      seed, keys, Seq(col("seq")), col("op"), store, n, 0L)
    (1 to versions).foreach { i =>
      Cdc.processPartitionedBatch(
        Seq(((i % 10) + 1L, s"b$i", i.toLong, "U")).toDF("k", "name", "seq", "op"),
        empty, keys, Seq(col("seq")), col("op"), store, n, i.toLong)
      Cdc.changesBetweenCdf(spark, store, i - 1L, i.toLong, keys)
        .write.mode("overwrite").parquet(s"$feed/v=$i")
      // deterministic commit clock: day i
      assert(new java.io.File(s"$feed/v=$i/_SUCCESS").setLastModified(i * 86400000L))
    }
    (store, feed)
  }

  private type Row5 = (Long, String, String, Long, java.sql.Timestamp)
  private def tableRows(name: String): Set[Row5] =
    spark.table(s"graft.$name")
      .select("k", "name", "_change_type", "_commit_version", "_commit_timestamp")
      .as[Row5].collect().toSet

  private def tailRows(name: String, opts: Map[String, String] = Map.empty): Set[Row5] = {
    val out = java.nio.file.Files.createTempDirectory("graft_cmp_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cmp_ckpt").toString
    val reader = opts.foldLeft(spark.readStream) { case (r, (k, v)) => r.option(k, v) }
    val q = reader.table(s"graft.$name")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(out)
      .select("k", "name", "_change_type", "_commit_version", "_commit_timestamp")
      .as[Row5].collect().toSet
  }

  test("compaction preserves batch + streaming reads exactly and bounds the file count") {
    val (store, feed) = build(24)
    CdcCatalog.registerFeed("cmp_eq", store, feed)
    try {
      val before = tableRows("cmp_eq")
      assert(before.map(_._4) === (1L to 24L).toSet)
      val tailBefore = tailRows("cmp_eq")
      assert(tailBefore === before)

      Cdc.compactFeed(spark, feed, segmentSize = 10)
      assert(Cdc.feedSegments(spark, feed) === Seq((1L, 10L)),
        s"got ${Cdc.feedSegments(spark, feed)}") // 11-14 too short a run, 15-24 kept recent
      assert(Cdc.feedVersions(spark, feed).sorted === (11L to 24L))
      assert(Cdc.feedRetainedVersions(spark, feed) === (1L to 24L))

      assert(tableRows("cmp_eq") === before,
        "compaction changed the batch-read feed (rows or commit timestamps)")
      assert(tailRows("cmp_eq") === before,
        "compaction changed what a fresh from-oldest tail serves")
      // bounded replay: versions 1-10 plan ONE file (the segment), not 10 dirs
      val stream = new CdcFeedStream("cmp_eq",
        spark.table("graft.cmp_eq").schema, CdcCatalog.lookupFeed("cmp_eq").get)
      val parts = stream.planInputPartitions(CdcFeedOffset(0L), CdcFeedOffset(10L))
      assert(parts.length === 1, s"expected 1 segment file, planned ${parts.length}")
      // a second compaction pass folds the next full run as versions age in
      Cdc.compactFeed(spark, feed, segmentSize = 10, keepRecentSingles = 4)
      assert(Cdc.feedSegments(spark, feed) === Seq((1L, 10L), (11L, 20L)))
      assert(tableRows("cmp_eq") === before)
    } finally CdcCatalog.unregister("cmp_eq")
  }

  test("a segment is atomic: admission ships it whole; startingVersion inside one is loud; " +
      "a checkpoint compaction ran past resumes loudly") {
    val (store, feed) = build(15)
    CdcCatalog.registerFeed("cmp_at", store, feed)
    try {
      Cdc.compactFeed(spark, feed, segmentSize = 10, keepRecentSingles = 5)
      assert(Cdc.feedSegments(spark, feed) === Seq((1L, 10L)))
      val d = CdcCatalog.lookupFeed("cmp_at").get
      val schema = spark.table("graft.cmp_at").schema
      // admission: cap 3 < segment size 10, yet the whole segment ships
      // as the first batch; the NEXT batch resumes version-counted
      val stream = new CdcFeedStream("cmp_at", schema, d, maxVersionsPerTrigger = Some(3))
      val end1 = stream.latestOffset(CdcFeedOffset(0L), stream.getDefaultReadLimit)
      assert(end1 === CdcFeedOffset(10L), s"segment must ship whole, got $end1")
      val end2 = stream.latestOffset(end1, stream.getDefaultReadLimit)
      assert(end2 === CdcFeedOffset(13L), s"post-segment admission broke: $end2")
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      // startingVersion inside the segment: loud
      val e1 = intercept[Exception](tailRows("cmp_at", Map("startingVersion" -> "5")))
      assert(messages(e1).exists(_.contains("inside compacted segment")),
        messages(e1).mkString(" | "))
      // at the segment start: serves the full tail
      assert(tailRows("cmp_at", Map("startingVersion" -> "1")).map(_._4) === (1L to 15L).toSet)
      // a checkpoint at v=4 that compaction ran past: loud, never double-served
      val e2 = intercept[Exception](
        stream.planInputPartitions(CdcFeedOffset(4L), CdcFeedOffset(15L)))
      assert(messages(e2).exists(_.contains("compacted past the checkpoint")) ||
        messages(e2).exists(_.contains("feed retention exceeded")),
        messages(e2).mkString(" | "))
    } finally CdcCatalog.unregister("cmp_at")
  }

  test("compactFeedEvery wires compaction into streaming maintenance: segments appear " +
      "behind the live window and the feed table keeps serving everything") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val store = java.nio.file.Files.createTempDirectory("graft_cmp_mstore").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cmp_mckpt").toString
    val feed = java.nio.file.Files.createTempDirectory("graft_cmp_mfeed").toString
    val seed = (1L to 10L).map(k => (k, s"orig$k")).toDF("k", "name")
    val mem = MemoryStream[(Long, String, Long, String)]
    val q = Cdc.maintainPartitionedSnapshot(
      mem.toDF().toDF("k", "name", "seq", "op"),
      seed, keys, Seq(col("seq")), col("op"), store, ckpt, n,
      feedPath = Some(feed), compactFeedEvery = 8, feedSegmentSize = 3).start()
    try {
      (0 to 12).foreach { i =>
        mem.addData(((i % 10) + 1L, s"m$i", i.toLong, "U"))
        q.processAllAvailable()
      }
    } finally q.stop()
    // batch 8 fired compaction: singles 1..8 at that point, keep 3 → 1..5
    // candidates → one full run of 3
    assert(Cdc.feedSegments(spark, feed) === Seq((1L, 3L)),
      s"got ${Cdc.feedSegments(spark, feed)}")
    assert(Cdc.feedRetainedVersions(spark, feed) === (1L to 12L))
    CdcCatalog.registerFeed("cmp_stream", store, feed)
    try {
      assert(tableRows("cmp_stream").map(_._4) === (1L to 12L).toSet)
      assert(tailRows("cmp_stream") === tableRows("cmp_stream"))
    } finally CdcCatalog.unregister("cmp_stream")
  }

  test("readFeedSince stays exact across segment boundaries; vacuum prunes whole " +
      "segments; a crashed compaction converges on re-run") {
    val (store, feed) = build(20)
    val expect = (sinceV: Long) => Cdc.readFeedSince(spark, feed, sinceV)
      .select("k", "name", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    val full = expect(0L)
    val mid = expect(5L)
    val tail = expect(14L)
    Cdc.compactFeed(spark, feed, segmentSize = 5, keepRecentSingles = 5)
    assert(Cdc.feedSegments(spark, feed) === Seq((1L, 5L), (6L, 10L), (11L, 15L)))
    assert(expect(0L) === full, "from-0 read changed under compaction")
    assert(expect(5L) === mid, "a mid-segment-boundary read changed under compaction")
    assert(expect(14L) === tail,
      "a resume point INSIDE a segment must still read exactly (batch residual filter)")
    // crash simulation: segment [1,5] committed but one covered v= dir
    // survived the delete — readers ignore it, re-run heals it
    val seg15 = spark.read.parquet(s"$feed/seg=1-5").drop("_commit_timestamp")
    spark.read.parquet(s"$feed/seg=6-10").drop("_commit_timestamp")
      .filter(col("_commit_version") === 6L)
      .write.parquet(s"$feed/v=6") // resurrect a covered single
    assert(Cdc.feedRetainedVersions(spark, feed) === (1L to 20L),
      "a single covered by a committed segment must not double-count")
    assert(expect(0L) === full, "a compaction leftover single leaked into reads")
    Cdc.compactFeed(spark, feed, segmentSize = 5, keepRecentSingles = 5)
    assert(!new java.io.File(s"$feed/v=6").exists, "re-run must heal the leftover")
    assert(seg15.collect().length === 10) // 5 versions × (update_preimage + update_postimage)
    // vacuum with floor 12: segments [1,5] and [6,10] fall wholly behind
    // → deleted; [11,15] straddles → kept whole
    Seq(21L, 22L).foreach { i =>
      Cdc.processPartitionedBatch(
        Seq((2L, s"b$i", i, "U")).toDF("k", "name", "seq", "op"),
        spark.range(0).selectExpr("id AS k", "'x' AS name"),
        keys, Seq(col("seq")), col("op"), store, n, i)
      Cdc.changesBetweenCdf(spark, store, i - 1, i, keys)
        .write.mode("overwrite").parquet(s"$feed/v=$i")
    }
    Cdc.vacuum(spark, store, keepVersions = 11, feedPath = Some(feed)) // floor = v12
    assert(Cdc.feedSegments(spark, feed) === Seq((11L, 15L)),
      s"got ${Cdc.feedSegments(spark, feed)}")
    assert(Cdc.feedRetainedVersions(spark, feed) === (11L to 22L))
  }
}
