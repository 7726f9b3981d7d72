package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bucketing = the co-located-join story for 100 TB (SURVEY.md §7.4.6 /
  * ARCHITECTURE.md): pre-shuffle both fact tables once at write time, then
  * every subsequent equi-join on the bucket key runs exchange-free. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // warehouse dir is a static conf, set at TestSpark session build
    val orders   = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    val lineitem = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    graft.sources.Sinks.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    graft.sources.Sinks.writeBucketed(lineitem, "b_lineitem", "l_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val joined = spark
        .table("b_orders")
        .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucketed SMJ: sorts allowed, but no Exchange below the join
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey") &&
        !joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join still shuffles:\n$plan")
      // and it computes the right answer
      val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBuckets === plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
