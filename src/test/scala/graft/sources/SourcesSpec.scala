package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("type", StringType)
  ))

  test("JSON-lines source: valid rows parse, corrupt lines dead-letter") {
    val dir = Files.createTempDirectory("graft_jsonl")
    Files.writeString(dir.resolve("a.json"),
      """{"id": 1, "type": "story"}
        |{"id": 2, "type": "video"}
        |{{{corrupt line
        |""".stripMargin)
    val src = new JsonLinesEventSource(dir.toString, schema)
    // Spark refuses scans whose referenced columns are ONLY the corrupt
    // column — materialize full rows, then split (the documented pattern).
    val rows = src.read(spark).collect()
    assert(rows.count(r => r.isNullAt(r.fieldIndex("_corrupt"))) === 2)
    assert(rows.count(r => !r.isNullAt(r.fieldIndex("_corrupt"))) === 1)
    assert(rows.find(r => !r.isNullAt(0) && r.getLong(0) == 1L).get.getString(1) === "story")
  }

  test("JSON-lines source: gzipped files decompress transparently") {
    val dir = Files.createTempDirectory("graft_jsonl_gz")
    val gz  = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("a.json.gz")))
    gz.write("""{"id": 9, "type": "gallery"}""".getBytes("UTF-8"))
    gz.close()
    val df = new JsonLinesEventSource(dir.toString, schema).read(spark)
    assert(df.filter(col("id") === 9).count() === 1)
  }

  test("FormatEventSource: orc and csv roundtrip the same rows as parquet") {
    val base = spark.read.parquet(s"${graft.TestSpark.sf0001}/nation.parquet")
    val dir  = Files.createTempDirectory("graft_formats")
    base.write.mode("overwrite").orc(s"$dir/orc")
    base.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    val viaOrc = new FormatEventSource(s"$dir/orc", base.schema, "orc").read(spark)
    val viaCsv = new FormatEventSource(s"$dir/csv", base.schema, "csv").read(spark)
    assert(viaOrc.collect().toSet === base.collect().toSet)
    assert(viaCsv.collect().toSet === base.collect().toSet)
  }

  test("JSON-lines streaming reads the same rows as batch") {
    val dir = Files.createTempDirectory("graft_jsonl_stream")
    Files.writeString(dir.resolve("a.json"), """{"id": 1, "type": "story"}""" + "\n")
    val src = new JsonLinesEventSource(dir.toString, schema)
    val q = src.readStream(spark).writeStream.format("memory").queryName("t_jsonl")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      assert(spark.table("t_jsonl").count() === 1)
    } finally q.stop()
  }
}
