package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Sink surface (SURVEY.md §2.A A9/A10): partitioned batched emit and
  * dead-letter routing.
  *
  * The reference forwards surviving events downstream partition-keyed by
  * document id in bounded put_records batches; the Spark-native equivalent
  * is a keyed repartition + partitioned write (batch) or foreachBatch
  * (streaming), with the corrupt-record split routed to a dead-letter
  * location instead of being dropped.
  */
object Sinks {

  /** A9 batch twin: partition-keyed parquet emit. `repartition(keyCol)`
    * is the put_records partition keying; partitionBy layout keeps
    * downstream reads prunable. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.repartition(col(partitionCol))
      .write
      .mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)

  /** A10: split a decoded stream on corruption and emit both sides — the
    * main output and the dead-letter queue. `corruptCol` is any boolean
    * marker column (e.g. parsed-struct IS NULL). */
  def writeWithDeadLetter(
      df: DataFrame,
      corrupt: org.apache.spark.sql.Column,
      mainPath: String,
      dlqPath: String
  ): Unit = {
    val marked = df.withColumn("__is_corrupt", corrupt).cache()
    try {
      marked.filter(!col("__is_corrupt")).drop("__is_corrupt").write.mode("overwrite").parquet(mainPath)
      marked.filter(col("__is_corrupt")).drop("__is_corrupt").write.mode("overwrite").parquet(dlqPath)
    } finally marked.unpersist()
  }

  /** Streaming form: foreachBatch applies the same split per micro-batch —
    * the exactly-once contract comes from the checkpoint + idempotent
    * (overwrite-by-batch-path) writes. */
  def streamWithDeadLetter(
      df: DataFrame,
      corrupt: org.apache.spark.sql.Column,
      mainPath: String,
      dlqPath: String,
      checkpoint: String
  ): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val marked = batch.withColumn("__is_corrupt", corrupt).cache()
        try {
          marked
            .filter(!col("__is_corrupt"))
            .drop("__is_corrupt")
            .write
            .mode("overwrite")
            .parquet(s"$mainPath/batch=$id")
          marked
            .filter(col("__is_corrupt"))
            .drop("__is_corrupt")
            .write
            .mode("overwrite")
            .parquet(s"$dlqPath/batch=$id")
        } finally { marked.unpersist(); () }
      }
}
