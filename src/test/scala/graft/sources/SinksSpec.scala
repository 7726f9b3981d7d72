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

  test("writeClustered: Z-order files cover small rectangles — skipping works on BOTH dims") {
    import spark.implicits._
    def fileStats(dir: String, a: String, b: String) = spark.read.parquet(dir)
      .select(col(a), col(b), input_file_name().as("f"))
      .groupBy("f")
      .agg(min(a).as("alo"), max(a).as("ahi"), min(b).as("blo"), max(b).as("bhi"))
      .as[(String, Long, Long, Long, Long)].collect()
    def overlapping(stats: Array[(String, Long, Long, Long, Long)],
                    loHi: ((String, Long, Long, Long, Long)) => (Long, Long),
                    wLo: Long, wHi: Long) =
      stats.count { s => val (lo, hi) = loHi(s); hi >= wLo && lo <= wHi }

    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val zDir = Files.createTempDirectory("graft_zorder").toString
    Sinks.writeClustered(li, zDir, "l_orderkey", "l_partkey", numFiles = 8)
    val zStats = fileStats(zDir, "l_orderkey", "l_partkey")
    assert(zStats.length >= 4, s"expected several files, got ${zStats.length}")
    assert(spark.read.parquet(zDir).count() === li.count())

    val (oLo, oHi) = (zStats.map(_._2).min, zStats.map(_._3).max)
    val (pLo, pHi) = (zStats.map(_._4).min, zStats.map(_._5).max)
    // every file's rectangle is a proper sub-range in BOTH dimensions on
    // average (z-order splits both; a 1-D sort leaves the other dim full)
    val avgOSpan = zStats.map(s => s._3 - s._2).sum.toDouble / zStats.length
    val avgPSpan = zStats.map(s => s._5 - s._4).sum.toDouble / zStats.length
    assert(avgOSpan < 0.8 * (oHi - oLo), s"orderkey not clustered: $avgOSpan vs ${oHi - oLo}")
    assert(avgPSpan < 0.8 * (pHi - pLo), s"partkey not clustered: $avgPSpan vs ${pHi - pLo}")
    // a narrow window on EITHER dim prunes at least some files
    def window(lo: Long, hi: Long): (Long, Long) = {
      val w = (hi - lo) / 20; (lo, lo + w)
    }
    val (owLo, owHi) = window(oLo, oHi)
    val (pwLo, pwHi) = window(pLo, pHi)
    assert(overlapping(zStats, s => (s._2, s._3), owLo, owHi) < zStats.length,
      "no file pruned for an orderkey window")
    assert(overlapping(zStats, s => (s._4, s._5), pwLo, pwHi) < zStats.length,
      "no file pruned for a partkey window")

    // contrast: a 1-D sort on orderkey leaves partkey unprunable — every
    // file spans (nearly) the full partkey range.
    val sDir = Files.createTempDirectory("graft_sorted1d").toString
    Sinks.writeSorted(li, sDir, Seq("l_orderkey"), numFiles = 8)
    val sStats = fileStats(sDir, "l_orderkey", "l_partkey")
    assert(overlapping(sStats, s => (s._4, s._5), pwLo, pwHi) === sStats.length,
      "1-D sort unexpectedly pruned the non-sort dimension (fixture too small?)")
  }

  test("writeClusteredK: 3-D Morton files cover small boxes — skipping works on ALL three dims") {
    import spark.implicits._
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val dir = Files.createTempDirectory("graft_zorder3").toString
    Sinks.writeClusteredK(li, dir, Seq("l_orderkey", "l_partkey", "l_suppkey"), numFiles = 8)
    assert(spark.read.parquet(dir).count() === li.count())
    val stats = spark.read.parquet(dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), input_file_name().as("f"))
      .groupBy("f")
      .agg(
        min("l_orderkey").as("olo"), max("l_orderkey").as("ohi"),
        min("l_partkey").as("plo"), max("l_partkey").as("phi"),
        min("l_suppkey").as("slo"), max("l_suppkey").as("shi"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(stats.length >= 4, s"expected several files, got ${stats.length}")
    // a narrow window on EACH dimension prunes at least one file — the
    // 3-way clustering property a 1-D (or 2-D) sort cannot give
    def prunes(lo: Long, hi: Long, loHi: ((String, Long, Long, Long, Long, Long, Long)) => (Long, Long)): Boolean = {
      val w = (hi - lo) / 20
      stats.count { s => val (flo, fhi) = loHi(s); fhi >= lo && flo <= lo + w } < stats.length
    }
    assert(prunes(stats.map(_._2).min, stats.map(_._3).max, s => (s._2, s._3)),
      "no file pruned on orderkey")
    assert(prunes(stats.map(_._4).min, stats.map(_._5).max, s => (s._4, s._5)),
      "no file pruned on partkey")
    assert(prunes(stats.map(_._6).min, stats.map(_._7).max, s => (s._6, s._7)),
      "no file pruned on suppkey")
  }

  test("writeTrainingShards: one dir per shard, rows stored in shuffled pos order") {
    import spark.implicits._
    val dir  = Files.createTempDirectory("graft_shards").toString
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    Sinks.writeTrainingShards(docs, col("doc_id"), dir, numShards = 4, seed = 7)

    val shardDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs.toSeq === (0 until 4).map(i => s"shard=$i"))
    // nothing lost, payload intact
    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count())
    assert(back.columns.toSet === docs.columns.toSet + "shard" + "pos")
    // each shard's FILE order is its pos order (training loaders stream
    // files front-to-back — the shuffle must be physical, not logical)
    (0 until 4).foreach { sId =>
      val pos = spark.read.parquet(s"$dir/shard=$sId")
        .select(monotonically_increasing_id().as("file_order"), col("pos"))
        .orderBy("file_order").select("pos").as[Long].collect()
      assert(pos.toSeq === pos.sorted.toSeq, s"shard $sId rows not stored in pos order")
      assert(pos.toSeq === (1L to pos.length).toSeq, s"shard $sId positions not dense")
      // and genuinely shuffled: doc ids within the shard are not in id order
      val ids = spark.read.parquet(s"$dir/shard=$sId").orderBy("pos")
        .select("doc_id").as[Long].collect()
      if (ids.length > 3) assert(ids.toSeq !== ids.sorted.toSeq, s"shard $sId not shuffled")
    }
    // deterministic: a rewrite with the same seed is byte-identical rows
    val dir2 = Files.createTempDirectory("graft_shards2").toString
    Sinks.writeTrainingShards(docs.repartition(9), col("doc_id"), dir2, numShards = 4, seed = 7)
    val a = spark.read.parquet(dir).select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect().sorted.toSeq
    val b = spark.read.parquet(dir2).select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a === b)
  }

  test("writeJsonlShards: gzipped jsonl roundtrip, stable hash sharding") {
    import spark.implicits._
    val dir  = Files.createTempDirectory("graft_jsonl").toString
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    Sinks.writeJsonlShards(docs, col("doc_id"), dir, numShards = 4)

    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs.toSeq === (0 until 4).map(i => s"shard=$i"))
    // files are .json.gz (gzip-compressed JSON lines)
    val files = new java.io.File(s"$dir/shard=0").listFiles().filter(_.getName.endsWith(".gz"))
    assert(files.nonEmpty, "shard files not gzip-compressed")
    // roundtrip: read back as json, same rows and payload
    val back = spark.read.json(dir)
    assert(back.count() === docs.count())
    val a = docs.select("doc_id", "text").as[(Long, String)].collect().sorted.toSeq
    val b = back.select("doc_id", "text").as[(Long, String)].collect().sorted.toSeq
    assert(a === b)
    // stable sharding: a rewrite from a different partitioning lands every
    // doc in the same shard (hash of id, not of placement)
    val dir2 = Files.createTempDirectory("graft_jsonl2").toString
    Sinks.writeJsonlShards(docs.repartition(7), col("doc_id"), dir2, numShards = 4)
    val s1 = spark.read.json(dir).select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val s2 = spark.read.json(dir2).select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(s1 === s2)
  }
}
