package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning (SURVEY.md §4.2): a partitioned fact joined
  * to a filtered dim must scan only the partitions the dim selects — at
  * 100 TB this is the difference between reading one status partition and
  * reading the table. */
class DppSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("partitioned fact scan is dynamically pruned by the dim filter") {
    val dir = Files.createTempDirectory("graft_dpp").toString
    spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)

    import spark.implicits._
    // DPP requires a selective filter over a real scan on the build side —
    // literal relations constant-fold and never trigger pruning insertion.
    val dimDir = Files.createTempDirectory("graft_dpp_dim").toString
    Seq(("F", "finished"), ("O", "open"), ("P", "partial"))
      .toDF("st", "label").write.mode("overwrite").parquet(dimDir)
    val dim  = spark.read.parquet(dimDir).filter(col("label") === "finished")
    val fact = spark.read.parquet(dir)
    val joined = fact
      .join(dim.hint("broadcast"), col("o_orderstatus") === col("st"))
      .groupBy(col("label")).agg(count(lit(1)).as("cnt"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"no DPP in plan:\n${plan.take(3000)}")

    // and the pruned scan still answers correctly
    val viaPartitions = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
      .filter(col("o_orderstatus") === "F").count()
    assert(viaPartitions("finished") === expected)
  }
}
