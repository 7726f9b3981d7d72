package graft
object RunOne {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("runone")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.tables.Tables.ensureNanosConf(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args(0)
    args.drop(1).foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sf)
      df.write.mode("overwrite").parquet(s"/tmp/runone/$name.parquet")
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name rows=" + spark.read.parquet(s"/tmp/runone/$name.parquet").count() +
        f" sec=$sec%.2f")
    }
    spark.stop()
  }
}
