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
}
