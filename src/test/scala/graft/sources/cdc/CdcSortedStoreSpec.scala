package graft.sources.cdc

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Cdc

/** Laws for the store's SUB-BUCKET read path:
  *  - every bucket file is KEY-SORTED (the MERGE write's per-partition
  *    sort), so per-row-group key statistics are TIGHT — min/max equal
  *    the file's first/last key, which is exactly what parquet's
  *    row-group filter needs to skip groups a point read can't match;
  *  - the scan's key panels reach the parquet reader as real filter
  *    predicates: a panel read through [[CdcPartitionReader]] decodes
  *    only matching rows (Spark re-checks every predicate above, so the
  *    pushdown stays IO advice, never correctness).
  */
class CdcSortedStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keys = Seq("k")
  private val n = 8
  private val payload = StructType(Seq(
    StructField("k", LongType), StructField("name", StringType),
    StructField("bal", DoubleType)))

  private def buildStore(): String = {
    val store = java.nio.file.Files.createTempDirectory("graft_sorted_store").toString
    val seed = (1L to 200L).map(k => (k, s"orig$k", k * 1.0)).toDF("k", "name", "bal")
    Cdc.processPartitionedBatch(
      seed.withColumn("_seq", lit(0L)).withColumn("_op", lit("U")),
      seed.limit(0), keys, Seq(col("_seq")), col("_op"), store, n, 0L)
    store
  }

  private def bucketFiles(store: String): Seq[String] = {
    val parts = new Path(s"$store/parts")
    val fs = parts.getFileSystem(new Configuration())
    fs.globStatus(new Path(parts, "_bucket=*/_writer=*/part-*.parquet"))
      .map(_.getPath.toString).toSeq.sorted
  }

  private def readKeys(file: String, filters: Array[(String, Array[Any])] = Array.empty): Seq[Long] = {
    val r = new CdcPartitionReader(Array(file), payload, filters)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (r.next()) out += r.get().getLong(0)
    r.close()
    out.toSeq
  }

  test("bucket files are key-sorted and their row-group key statistics are tight") {
    val store = buildStore()
    val files = bucketFiles(store)
    assert(files.size === n, s"expected one file per bucket, got ${files.size}")
    files.foreach { f =>
      val ks = readKeys(f)
      assert(ks === ks.sorted, s"file $f is not key-sorted")
      val footer = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), new Configuration()))
      try {
        val blocks = footer.getFooter.getBlocks.asScala
        assert(blocks.nonEmpty)
        // tight stats per row group: min/max equal the group's edge keys
        var offset = 0
        blocks.foreach { b =>
          val rows = b.getRowCount.toInt
          val stats = b.getColumns.asScala
            .find(_.getPath.toDotString == "k").get.getStatistics
          val (lo, hi) = (stats.genericGetMin.asInstanceOf[java.lang.Long].longValue,
            stats.genericGetMax.asInstanceOf[java.lang.Long].longValue)
          assert(lo === ks(offset), s"row-group min is not the first key in $f")
          assert(hi === ks(offset + rows - 1), s"row-group max is not the last key in $f")
          offset += rows
        }
      } finally footer.close()
    }
  }

  test("a key panel pushed to the reader decodes only matching rows") {
    val store = buildStore()
    val all = bucketFiles(store).flatMap(f => readKeys(f))
    assert(all.toSet === (1L to 200L).toSet)
    // probe each bucket file with one key it holds and one it cannot
    bucketFiles(store).foreach { f =>
      val ks = readKeys(f)
      val hit = ks.head
      assert(readKeys(f, Array(("k", Array[Any](hit)))) === Seq(hit))
      // 999 is outside every file's [min,max]: the row-group filter drops
      // the whole group before any record decodes
      assert(readKeys(f, Array(("k", Array[Any](999L)))).isEmpty)
      // a two-value panel ORs; an unrelated string panel conjunct ANDs
      val two = ks.take(2)
      assert(readKeys(f, Array(("k", two.map(_.asInstanceOf[Any]).toArray))) === two)
      assert(readKeys(f, Array(
        ("k", Array[Any](hit)),
        ("name", Array[Any](s"orig$hit")))) === Seq(hit))
      assert(readKeys(f, Array(
        ("k", Array[Any](hit)),
        ("name", Array[Any]("no-such-name")))).isEmpty)
    }
  }

  test("catalog point reads stay exact end to end with the parquet filter active") {
    val store = buildStore()
    CdcCatalog.register("sorted_pt", store, keys, n)
    try {
      val got = spark.table("graft.sorted_pt")
        .filter(col("k").isin(3L, 77L, 150L))
        .select("k", "name", "bal").as[(Long, String, Double)].collect().toSet
      assert(got === Set(3L, 77L, 150L).map(k => (k, s"orig$k", k * 1.0)))
    } finally CdcCatalog.unregister("sorted_pt")
  }
}
