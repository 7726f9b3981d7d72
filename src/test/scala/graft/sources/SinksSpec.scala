package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def parquetFiles(path: String): Array[java.io.File] =
    new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))

  test("compact merges a small-files directory preserving rows") {
    val dir = Files.createTempDirectory("graft_compact").toString
    // produce many small files: one per partition
    spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .repartition(32).write.mode("overwrite").parquet(dir)
    val before = parquetFiles(dir).length
    assert(before >= 16, s"setup produced only $before files")
    val rows = spark.read.parquet(dir).count()

    Sinks.compact(spark, dir, targetBytes = 8L * 1024 * 1024)
    val after = parquetFiles(dir)
    assert(after.length < before / 4, s"still ${after.length} files")
    assert(spark.read.parquet(dir).count() === rows)
  }

  test("writeSorted produces range-disjoint files (parquet stats skippable)") {
    val dir = Files.createTempDirectory("graft_sorted").toString
    val orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    Sinks.writeSorted(orders, dir, Seq("o_orderkey"), numFiles = 4)

    val perFile = spark.read.parquet(dir)
      .select(col("o_orderkey"), input_file_name().as("f"))
      .groupBy("f")
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .orderBy("lo")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(perFile.length >= 2)
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, s"overlapping ranges: ${perFile.mkString(",")}")
      case _                         =>
    }
    assert(spark.read.parquet(dir).count() === orders.count())
  }
}
