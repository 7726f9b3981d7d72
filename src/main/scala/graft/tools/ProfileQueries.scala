package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev profiling harness (guide §1): run named queries with the bench's
  * session shape and report, per query — wall seconds, Spark job count,
  * stage count, task count, summed executor task time, and the Catalyst
  * phase times (analysis/optimization/planning) — so structural overhead
  * (actions, exchanges, plan size) is visible without the Spark UI.
  *
  * Usage: sbt "runMain graft.tools.ProfileQueries <sfDir> [names...]"
  * (no names = the 40 slowest from bench_out.json if present, else all)
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .config("spark.sql.catalog.graft", "graft.sources.cdc.CdcCatalog")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (t.taskMetrics != null) taskTimeMs += t.taskMetrics.executorRunTime
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // Session warm-up (same as Bench)
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").write.format("noop").mode("overwrite").save()
    }
    graft.queries.LlmQueries.prebuildIndexes(spark, sfDir)
    graft.queries.CoreQueries.prebuildArtifacts(spark, sfDir)

    val selected =
      if (names.nonEmpty) graft.SparkEntry.queries.filter(kv => names.contains(kv._1)).toSeq.sortBy(_._1)
      else graft.SparkEntry.queries.toSeq.sortBy(_._1)
    println(f"${"query"}%-28s ${"sec"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"taskSec"}%8s ${"planMs"}%7s")
    selected.foreach { case (name, fn) =>
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0L
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val phases = df.queryExecution.tracker.phases
          .map { case (p, s) => p -> (s.endTimeMs - s.startTimeMs) }
        val planMs = phases.values.sum
        // listener events are async; give the bus a beat
        Thread.sleep(150)
        println(f"$name%-28s $sec%7.2f $jobs%5d $stages%7d $tasks%6d ${taskTimeMs / 1000.0}%8.2f $planMs%7d")
      } catch {
        case e: Throwable => println(s"$name FAILED: $e")
      }
    }
    spark.stop()
  }
}
