package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seeded label propagation (Raghavan et al. 2007, the semi-supervised
  * variant) over an undirected graph — the corpus use: a few documents
  * carry trusted labels (human quality ratings, verified provenance) and
  * the near-dup/similarity graph spreads them to everything connected, so
  * a 100 TB corpus inherits curation from a tiny labeled core.
  *
  * Deterministic by construction: synchronous rounds (every node updates
  * from the PREVIOUS round's labels), majority vote with ties broken by
  * smallest label, seeds pinned. A fixed round budget replaces a
  * convergence test — plain LPA can oscillate on bipartite structures, and
  * a fixed budget is reproducible where "run until stable" is not.
  *
  * 100 TB shape (the connectedComponents conventions): per round, one
  * keyed join (labels → edges) + one hash agg (votes) + one rank-1 window
  * (argmax per node, WindowGroupLimit-prunable); every round's frame is
  * `localCheckpoint`ed so plan depth stays O(1) and superseded blocks are
  * freed. Work per round is edge-sized, state is node-sized — nothing
  * driver-bound.
  */
object LabelProp {

  /** Propagate `seeds` (node, label) over `edges` (src, dst — undirected,
    * one row per edge either direction) for exactly `rounds` synchronous
    * rounds. Returns (node, label) for every node in the edge set or seed
    * set; `label` is null for nodes no label ever reached. */
  def run(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    import org.apache.spark.sql.execution.LogicalRDD
    require(rounds >= 1, s"rounds must be >= 1: $rounds")

    def checkpointed(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[_]) = {
      val cp = df.localCheckpoint(eager = true)
      val rdd = cp.queryExecution.analyzed
        .collectFirst { case l: LogicalRDD => l.rdd }
        .getOrElse(throw new IllegalStateException("localCheckpoint did not yield a LogicalRDD plan"))
      (cp, rdd)
    }

    val (sym, symRdd) = checkpointed(
      edges
        .toDF("src", "dst")
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"))
        .union(edges.toDF("src", "dst").select(col("dst").as("src"), col("src").as("dst")))
        .distinct())

    val nodes = sym
      .select(col("src").as("node"))
      .union(seeds.toDF("node", "label").select(col("node")))
      .distinct()

    var (labels, labelsRdd) = checkpointed(
      nodes
        .join(seeds.toDF("node", "seed_label"), Seq("node"), "left")
        .select(col("node"), col("seed_label").as("label"), col("seed_label").isNotNull.as("is_seed")))

    val wNode = Window.partitionBy(col("node")).orderBy(col("votes").desc, col("nbr_label"))
    var i = 0
    while (i < rounds) {
      val best = sym
        .join(
          labels.filter(col("label").isNotNull).select(col("node").as("src"), col("label").as("nbr_label")),
          "src")
        .groupBy(col("dst").as("node"), col("nbr_label"))
        .agg(count(lit(1)).as("votes"))
        .withColumn("rn", row_number().over(wNode))
        .filter(col("rn") === 1)
        .select(col("node"), col("nbr_label"))
      val (next, nextRdd) = checkpointed(
        labels
          .join(best, Seq("node"), "left")
          .select(
            col("node"),
            when(col("is_seed"), col("label"))
              .otherwise(coalesce(col("nbr_label"), col("label")))
              .as("label"),
            col("is_seed")))
      labelsRdd.unpersist(blocking = false)
      labels = next
      labelsRdd = nextRdd
      i += 1
    }
    symRdd.unpersist(blocking = false)
    labels.select(col("node"), col("label"))
  }
}
