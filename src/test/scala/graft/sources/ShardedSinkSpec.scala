package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.sharded.ShardedStreamProvider

/** WRITE half of the DSv2 sharded connector (A9): batch append via the
  * two-phase rename commit, streaming epochs with idempotent replay, and
  * the read-side round-trip — all through the public write/writeStream
  * surface. */
class ShardedSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fmt = classOf[ShardedStreamProvider].getName

  private def readAll(root: String): Seq[(Int, Long, String)] =
    spark.read.format(fmt).option("path", root).load()
      .as[(Int, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("batch write → batch read round-trip: per-shard payloads, no temp residue") {
    val root = Files.createTempDirectory("sharded_sink").toString
    val df = Seq(
      (0, 0L, "a0"), (0, 0L, "a1"), (1, 0L, "b0"), (2, 0L, "c0"), (2, 0L, "c1")
    ).toDF("shard", "seq", "payload")
    df.coalesce(1).write.format(fmt).option("path", root).mode("append").save()
    val back = readAll(root)
    assert(back.map(r => (r._1, r._3)) ===
      Seq((0, "a0"), (0, "a1"), (1, "b0"), (2, "c0"), (2, "c1")))
    // seq assigned densely per shard by the READ side
    assert(back.filter(_._1 == 0).map(_._2) === Seq(0L, 1L))
    assert(!Files.exists(java.nio.file.Paths.get(root, "_tmp")) ||
      new java.io.File(s"$root/_tmp").list().isEmpty, "temp dir must be cleaned on commit")
  }

  test("payloads with embedded newlines are rejected at write time (JSONL framing)") {
    val root = Files.createTempDirectory("sharded_sink_nl").toString
    val bad  = Seq((0, 0L, "line1\nline2")).toDF("shard", "seq", "payload")
    val e = intercept[Exception] {
      bad.coalesce(1).write.format(fmt).option("path", root).mode("append").save()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => c.getMessage != null && c.getMessage.contains("embedded newline")),
      s"wrong failure: $e")
    // nothing published: a failed write must leave no shard files behind
    val published = Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("shard="))
    assert(published.isEmpty, s"failed write published files: ${published.toSeq}")
  }

  test("second batch append adds files — append-only, earlier data intact") {
    val root = Files.createTempDirectory("sharded_sink2").toString
    Seq((0, 0L, "x0")).toDF("shard", "seq", "payload")
      .coalesce(1).write.format(fmt).option("path", root).mode("append").save()
    Seq((0, 0L, "x1"), (1, 0L, "y0")).toDF("shard", "seq", "payload")
      .coalesce(1).write.format(fmt).option("path", root).mode("append").save()
    val back = readAll(root)
    assert(back.map(r => (r._1, r._3)).toSet === Set((0, "x0"), (0, "x1"), (1, "y0")))
    assert(back.filter(_._1 == 0).map(_._2) === Seq(0L, 1L), "seq stays dense across appends")
  }

  test("streaming write: epochs land per micro-batch; connector round-trips a stream") {
    val root = Files.createTempDirectory("sharded_sink_stream").toString
    val ckpt = Files.createTempDirectory("sharded_sink_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, String)]
    val q = mem.toDF().toDF("shard", "payload")
      .withColumn("seq", lit(0L))
      .select(col("shard"), col("seq"), col("payload"))
      .writeStream.format(fmt)
      .option("path", root)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData((0, "s0"), (1, "t0"))
      q.processAllAvailable()
      mem.addData((0, "s1"))
      q.processAllAvailable()
    } finally q.stop()
    val back = readAll(root)
    assert(back.map(r => (r._1, r._3)) === Seq((0, "s0"), (0, "s1"), (1, "t0")))
  }

  test("deterministic names make a replayed epoch idempotent (delete-then-rename)") {
    // Simulate a re-delivered epoch by running the same logical write
    // twice through the streaming writer machinery with the same
    // (writeId, epoch, partition): the second commit must overwrite, not
    // duplicate.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val root = Files.createTempDirectory("sharded_sink_epoch").toString
    def runEpoch(payload: String): Unit = {
      val w = new graft.sources.sharded.ShardedStreamingWrite(root, "wid-1", 0, 2)
      val writer = w.createStreamingWriterFactory(null).createWriter(0, 0L, 7L)
      writer.write(InternalRow(5, 0L, UTF8String.fromString(payload)))
      val msg = writer.commit()
      w.commit(7L, Array(msg))
    }
    runEpoch("first")
    runEpoch("second")
    val back = readAll(root)
    assert(back === Seq((5, 0L, "second")), s"replay duplicated: $back")
  }

  test("abort leaves no published files") {
    val root = Files.createTempDirectory("sharded_sink_abort").toString
    val w = new graft.sources.sharded.ShardedBatchWrite(root, "wid-a", 0, 2)
    val writer = w.createBatchWriterFactory(null).createWriter(0, 0L)
    writer.write(org.apache.spark.sql.catalyst.InternalRow(
      3, 0L, org.apache.spark.unsafe.types.UTF8String.fromString("doomed")))
    writer.abort()
    w.abort(Array.empty)
    assert(readAll(root).isEmpty)
    assert(!new java.io.File(s"$root/shard=3").exists())
  }
}
