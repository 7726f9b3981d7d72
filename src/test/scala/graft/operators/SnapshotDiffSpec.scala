package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def oldSnap = Seq(
    (1L, "same"), (2L, "will change"), (3L, "will be removed")
  ).toDF("doc_id", "text")

  private def newSnap = Seq(
    (1L, "same"), (2L, "changed!"), (4L, "brand new")
  ).toDF("doc_id", "text")

  test("classifies added / removed / changed / unchanged") {
    val d = SnapshotDiff
      .diff(oldSnap, newSnap, col("doc_id"), col("text"))
      .select("id", "status")
      .as[(Long, String)].collect().toMap
    assert(d === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("hash columns are null exactly on the missing side") {
    val d = SnapshotDiff
      .diff(oldSnap, newSnap, col("doc_id"), col("text"))
      .as[(Long, String, Option[String], Option[String])].collect().map(r => r._1 -> r).toMap
    assert(d(3L)._4.isEmpty && d(3L)._3.nonEmpty)
    assert(d(4L)._3.isEmpty && d(4L)._4.nonEmpty)
    assert(d(1L)._3 === d(1L)._4)
    assert(d(2L)._3 !== d(2L)._4)
  }

  test("summary matches diff and is partitioning-independent") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val b = docs.filter(col("doc_id") % 5 =!= 0) // 1/5 removed
    val d = SnapshotDiff.diff(docs, b, col("doc_id"), col("text"))
    val s = SnapshotDiff.summary(d).as[(String, Long)].collect().toMap
    val total = docs.count()
    assert(s.getOrElse("removed", 0L) + s.getOrElse("unchanged", 0L) === total)
    assert(s.getOrElse("added", 0L) === 0L && s.getOrElse("changed", 0L) === 0L)
    val s2 = SnapshotDiff
      .summary(SnapshotDiff.diff(docs.repartition(9), b.repartition(4), col("doc_id"), col("text")))
      .as[(String, Long)].collect().toMap
    assert(s === s2)
  }
}
