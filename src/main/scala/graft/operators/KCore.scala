package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-core decomposition by distributed peeling — the graph-density filter
  * for similarity graphs: the k-core is the (unique) maximal subgraph in
  * which every node keeps ≥ k neighbors. On a near-dup graph the 2-core
  * separates genuine duplicate CLUSTERS (cliques, cycles — mutually-
  * confirming evidence) from the chains and stars that a low threshold
  * strings together; spam/link-farm detection and dense-community mining
  * use higher k the same way.
  *
  * Algorithm: synchronous peeling (the textbook distributed formulation):
  * repeatedly drop every node whose CURRENT degree is < k — in rounds, so
  * each round is two plain aggregations and two anti-joins, all keyed
  * shuffles with map-side combine; no driver state beyond the one scalar
  * "how many dropped this round". Rounds are bounded by the longest
  * peeling chain — usually a handful of shell layers, but worst-case
  * O(n) on a pure path graph (a 2k-node chain peels from both ends in
  * ~k rounds), so the default bound is generous: each round is just two
  * cheap keyed aggregations. Per-round `localCheckpoint` truncates
  * lineage exactly like connectedComponents, and exceeding `maxRounds`
  * THROWS rather than returning a half-peeled graph (the repo's
  * non-convergence convention).
  *
  * The fixpoint is order-independent (peeling is confluent — removing any
  * sub-k node never makes another node eligible to stay), so the result
  * is deterministic on any partitioning; KCoreSpec pins that plus
  * definition/maximality laws against a brute-force reference.
  *
  * Returns (node, core_deg): surviving nodes with their degree INSIDE the
  * k-core. */
object KCore {

  def kCore(edges: DataFrame, a: Column, b: Column, k: Int, maxRounds: Int = 100000): DataFrame = {
    require(k >= 1, "k must be >= 1")
    def canonicalize(df: DataFrame): DataFrame = df
      .select(least(a, b).as("u"), greatest(a, b).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()

    def degrees(e: DataFrame): DataFrame = e
      .select(col("u").as("n"))
      .unionAll(e.select(col("v").as("n")))
      .groupBy("n")
      .agg(count(lit(1)).as("deg"))

    var cur   = canonicalize(edges).localCheckpoint(true)
    var round = 0
    var done  = false
    while (!done) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"k-core peeling did not converge in $maxRounds rounds (k=$k)")
      val bad = degrees(cur).filter(col("deg") < k).select(col("n")).localCheckpoint(true)
      if (bad.isEmpty) done = true
      else {
        val next = cur
          .join(bad.withColumnRenamed("n", "u"), Seq("u"), "left_anti")
          .join(bad.withColumnRenamed("n", "v"), Seq("v"), "left_anti")
          .select(col("u"), col("v"))
          .localCheckpoint(true)
        cur = next
        round += 1
      }
    }
    degrees(cur).select(col("n").as("node"), col("deg").cast("long").as("core_deg"))
  }
}
