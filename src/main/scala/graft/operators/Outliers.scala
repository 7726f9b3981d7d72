package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Embedding-space outlier detection (SURVEY §2.D D3 extension) — the
  * hygiene pass a pipeline runs before ANN indexing / SemDeDup: flag
  * vectors whose cosine-to-their-group-centroid sits far below the
  * group's norm (corrupt embeddings, mislabeled rows, encoder failures).
  *
  * Determinism discipline: the centroid is an EXACT per-dimension mean
  * (coordinates summed on a 1e-9 integer grid — the d3_slice_centroid
  * convention); the per-group moments of the cosine are exact long /
  * decimal sums on the same grid (the c10_agg_corr convention), so the
  * z-scores and flags are partitioning- and engine-independent.
  *
  * 100 TB shape: one keyed (group, dim) shuffle for centroids; the
  * centroid table is groups×dim-sized and BROADCASTS back; the moment agg
  * is a second keyed shuffle carrying one long per row. Nothing is ever
  * all-pairs and no driver-side state exists. */
object Outliers {

  /** (id, group, cos_c, z, is_outlier): cosine of each vector to its
    * group centroid, the within-group z-score of that cosine, and the
    * z < -zThresh flag. Groups of size 1 get z = null, is_outlier=false. */
  def cosineOutliers(
      emb: DataFrame,
      idCol: Column,
      vecCol: Column,
      groupCol: Column,
      zThresh: Double = 2.0
  ): DataFrame = {
    val s = emb.sparkSession
    val base = emb.select(
      idCol.cast("long").as("id"),
      groupCol.as("grp"),
      VectorOps.asDouble(vecCol).as("v"))

    // Exact per-dimension mean on the 1e-9 grid — whole-vector aggregation
    // (functions/VectorAgg.sumCentroids): bit-identical to the exploded
    // (grp, pos) plan, without the d× row blowup through the agg.
    val cent = graft.functions.VectorAgg
      .sumCentroids(base, col("grp"), col("v"))
      .withColumnRenamed("cvec", "centroid")

    val scored = base
      .join(broadcast(cent), Seq("grp"))
      .withColumn("cos", round(VectorOps.cosineNative(s, col("v"), col("centroid")), 9))
      .withColumn("cmi", round(col("cos") * lit(1e9)).cast("long"))

    // Exact moments: s1 fits a long (|cmi| ≤ 1e9); cmi² ≤ 1e18 fits a
    // long per element, the SUM goes through decimal(38,0).
    val stats = scored
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("cmi")).as("s1"),
        sum((col("cmi") * col("cmi")).cast("decimal(38,0)")).as("s2"))
      .withColumn("mean", col("s1").cast("double") / (col("n") * lit(1e9)))
      .withColumn("ex2", col("s2").cast("double") / (col("n") * lit(1e18)))
      .withColumn(
        "sd",
        sqrt((col("ex2") - col("mean") * col("mean")) * col("n") / nullif(col("n") - 1, lit(0))))
      .select(col("grp"), col("mean"), col("sd"))

    scored
      .join(broadcast(stats), Seq("grp"))
      .select(
        col("id"),
        col("grp"),
        col("cos").as("cos_c"),
        round((col("cos") - col("mean")) / col("sd"), 6).as("z"),
        coalesce((col("cos") - col("mean")) / col("sd") < lit(-zThresh), lit(false))
          .as("is_outlier"))
  }
}
