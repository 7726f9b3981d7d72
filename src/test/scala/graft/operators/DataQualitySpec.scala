package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.DataQuality.Check

class DataQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def facts = Seq(
    (1L, Some("a"), 10.0, Some(100L)),
    (2L, Some("b"), -1.0, Some(100L)), // negative amount
    (3L, None, 5.0, Some(200L)),       // null name
    (3L, Some("c"), 7.0, Some(999L)),  // dup id + orphan fk
    (4L, Some("d"), 2.0, None)         // null fk (RI ignores)
  ).toDF("id", "name", "amount", "fk")

  private def dim = Seq(100L, 200L).toDF("pk")

  test("audit: one pass, per-check rows/violations/metric") {
    val got = DataQuality
      .audit(facts, Seq(
        Check("completeness_name", col("name").isNotNull),
        Check("compliance_amount_nonneg", col("amount") >= 0)))
      .orderBy("check_name")
      .as[(String, Long, Long, Double)]
      .collect()
    assert(got === Seq(
      ("completeness_name", 5L, 1L, 0.8),
      ("compliance_amount_nonneg", 5L, 1L, 0.8)))
  }

  test("audit: a null predicate result counts as a violation (SQL-boolean trap)") {
    val df  = Seq(Some(1.0), None, Some(-2.0)).toDF("x")
    val got = DataQuality
      .audit(df, Seq(Check("nonneg", col("x") >= 0)))
      .as[(String, Long, Long, Double)]
      .collect()
      .head
    // x = null makes (x >= 0) null, which must NOT pass the check.
    assert(got === (("nonneg", 3L, 2L, 0.333333)))
  }

  test("uniqueness: violations count every row in a shared-key group") {
    val got = DataQuality
      .uniqueness(facts, "uniq_id", Seq(col("id")))
      .as[(String, Long, Long, Double)]
      .collect()
      .head
    assert(got === (("uniq_id", 5L, 2L, 0.6)))
  }

  test("referential: orphans counted, null FKs exempt, total preserved") {
    val got = DataQuality
      .referential(facts, "ri_fk", col("fk"), dim, col("pk"))
      .as[(String, Long, Long, Double)]
      .collect()
      .head
    assert(got === (("ri_fk", 5L, 1L, 0.8)))
  }

  test("referential: duplicate PK rows in the dimension do not multiply facts") {
    val dupDim = Seq(100L, 100L, 200L).toDF("pk")
    val got = DataQuality
      .referential(facts, "ri_fk", col("fk"), dupDim, col("pk"))
      .as[(String, Long, Long, Double)]
      .collect()
      .head
    assert(got === (("ri_fk", 5L, 1L, 0.8)))
  }

  test("empty table: metric 1.0 everywhere, zero counts") {
    val empty = Seq.empty[(Long, Option[String], Double, Option[Long])]
      .toDF("id", "name", "amount", "fk")
    val a = DataQuality.audit(empty, Seq(Check("c", col("name").isNotNull)))
      .as[(String, Long, Long, Double)].collect().head
    val u = DataQuality.uniqueness(empty, "u", Seq(col("id")))
      .as[(String, Long, Long, Double)].collect().head
    val r = DataQuality.referential(empty, "r", col("fk"), dim, col("pk"))
      .as[(String, Long, Long, Double)].collect().head
    assert(a === (("c", 0L, 0L, 1.0)))
    assert(u === (("u", 0L, 0L, 1.0)))
    assert(r === (("r", 0L, 0L, 1.0)))
  }

  test("audit plans ONE aggregate over one scan regardless of check count") {
    val plan = DataQuality
      .audit(facts, (1 to 8).map(i => Check(s"c$i", col("amount") >= i)))
      .queryExecution.executedPlan.toString
    // one partial+final pair, not eight scans
    assert("HashAggregate".r.findAllIn(plan).size <= 4, plan)
    assert("LocalTableScan".r.findAllIn(plan).size + "Scan".r.findAllIn(plan).size <= 6, plan)
  }
}
