package graft.operators

import java.util.Base64

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ArcPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gz(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g   = new java.util.zip.GZIPOutputStream(bos)
    g.write(s.getBytes("UTF-8")); g.close()
    bos.toByteArray
  }
  private def payload(json: String): String = Base64.getEncoder.encodeToString(gz(json))

  private def envelope(
      id: String,
      typ: String = "story",
      op: String = "insert",
      published: Boolean = true,
      section: String = "news",
      website: String = "site-a"
  ): String =
    s"""{"version":"0.10.7","type":"$typ","operation":"$op","date":"2024-03-01T10:00:00Z","id":"$id",
        "body":{"_id":"doc-$id","type":"$typ","canonical_url":"/x/$id",
          "headlines":{"basic":"headline $id"},
          "credits":{"by":[{"name":"a reporter"}]},
          "taxonomy":{"sections":[{"_id":"$section","name":"$section"}]},
          "revision":{"published":$published},
          "websites":{"$website":{"website_url":"/x/$id"}}}}""".stripMargin.replaceAll("\n\\s*", "")

  private val cfg = ArcPipeline.FilterConfig(
    allowedTypes = Seq("story", "video"),
    sectionAllowlist = Seq("news", "sports"),
    website = Some("site-a")
  )

  test("end-to-end: decode → filter → project keeps only qualifying events") {
    val rows = Seq(
      payload(envelope("1")),                          // keep
      payload(envelope("2", typ = "redirect")),        // wrong type
      payload(envelope("3", published = false)),       // unpublished
      payload(envelope("4", section = "opinion")),     // wrong section
      payload(envelope("5", website = "site-b")),      // wrong website
      payload(envelope("6", op = "update")),           // keep
      "!!!not-base64-gzip!!!",                         // undecodable → DLQ
      payload("this is not json at all {{{")           // bad json → DLQ
    ).toDF("payload")

    val (out, dlq) = ArcPipeline.run(rows, col("payload"), cfg)
    val kept = out.select("event_id", "headline", "section_ids", "authors").collect()
    assert(kept.map(_.getString(0)).sorted === Array("1", "6"))
    assert(kept.head.getString(1).startsWith("headline"))
    assert(kept.head.getSeq[String](2) === Seq("news"))
    assert(kept.head.getSeq[String](3) === Seq("a reporter"))
    assert(dlq.count() === 2)
    assert(dlq.filter(col("error") === "UNDECODABLE").count() === 1)
  }

  test("projection flattens nested ANS paths with null tolerance") {
    val sparse = payload("""{"type":"story","operation":"insert","id":"s1",
      "body":{"_id":"d1","revision":{"published":true}}}""".replaceAll("\n\\s*", ""))
    val (out, dlq) = ArcPipeline.run(Seq(sparse).toDF("payload"), col("payload"),
      ArcPipeline.FilterConfig(requirePublished = true))
    val row = out.collect().head
    assert(row.getAs[String]("headline") == null) // absent → null, .get tolerance
    assert(row.getAs[String]("doc_id") === "d1")
    assert(dlq.count() === 0)
  }

  test("streaming: identical pipeline incrementalizes over micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val (out, _) = ArcPipeline.run(mem.toDF().withColumnRenamed("value", "payload"), col("payload"), cfg)
    val q = out.writeStream.format("memory").queryName("t_arc").outputMode("append").start()
    try {
      mem.addData(payload(envelope("10")), payload(envelope("11", typ = "image")))
      q.processAllAvailable()
      mem.addData(payload(envelope("12")))
      q.processAllAvailable()
      val ids = spark.table("t_arc").select("event_id").as[String].collect().sorted
      assert(ids === Array("10", "12"))
    } finally q.stop()
  }

  test("runRecords: Kinesis-shaped binary-payload records flow end to end") {
    val recs = Seq(
      (gz(envelope("21")), "doc-21", "seq-1"),
      (gz(envelope("22", typ = "redirect")), "doc-22", "seq-2"),
      ("junk".getBytes("UTF-8"), "doc-23", "seq-3")
    ).toDF("payload", "partition_key", "sequence_number")
    val (out, dlq) = ArcPipeline.runRecords(recs, cfg)
    assert(out.select("event_id").as[String].collect().sorted === Array("21"))
    assert(dlq.count() === 1)
  }

  test("observe(): decode metrics count totals and corruptions exactly once") {
    val rows = Seq(payload(envelope("1")), "garbage one", "garbage two").toDF("payload")
    val obs  = new org.apache.spark.sql.Observation(s"arc_${System.nanoTime()}")
    val (out, _) = ArcPipeline.run(rows, col("payload"), cfg, observation = Some(obs))
    out.collect() // action triggers the observation
    val m = obs.get
    assert(m("total_records") === 3L)
    assert(m("corrupt_records") === 2L)
  }

  test("fuzz: random payload corruption — every record decodes or dead-letters, none crash") {
    val rnd  = new scala.util.Random(42)
    val good = (1 to 40).map(i => payload(envelope(i.toString)))
    val corrupted = good.map { p =>
      rnd.nextInt(4) match {
        case 0 => p.substring(0, p.length / 2)              // truncated base64
        case 1 => "@@@" + p                                  // leading garbage
        case 2 => new String(rnd.nextBytes(24).map(b => (math.abs(b % 26) + 'a').toChar)) // noise
        case 3 => payload(envelope(rnd.nextInt().toString).replace("{", "[")) // broken json
      }
    }
    val all = (good ++ corrupted).toDF("payload")
    val decoded = ArcPipeline.decodeEnvelope(all, col("payload"))
    val corrupt = decoded.filter(col("event._corrupt").isNotNull).count()
    val valid   = decoded.filter(col("event._corrupt").isNull).count()
    assert(corrupt + valid === 80L, "records lost or duplicated in decode")
    assert(valid >= 40L, "valid records misclassified")
    val (out, dlq) = ArcPipeline.run(all, col("payload"), cfg)
    assert(out.count() + dlq.count() <= 80L)
    assert(dlq.count() === corrupt)
  }

  test("partitioned sink + dead-letter routing writes both sides") {
    val dir  = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val rows = Seq(payload(envelope("1")), payload(envelope("2", op = "update")), "garbage").toDF("payload")
    val (out, dlq) = ArcPipeline.run(rows, col("payload"), cfg)
    graft.sources.Sinks.writePartitioned(out, s"$dir/main", "operation")
    dlq.write.mode("overwrite").parquet(s"$dir/dlq")
    val back = spark.read.parquet(s"$dir/main")
    assert(back.count() === 2)
    assert(back.select("operation").distinct().count() === 2)
    assert(spark.read.parquet(s"$dir/dlq").count() === 1)
    // partition layout prunable: operation=insert directory exists
    assert(new java.io.File(s"$dir/main/operation=insert").exists())
  }
}
