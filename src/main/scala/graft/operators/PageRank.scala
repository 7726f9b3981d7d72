package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** PageRank over an edge list via iterative DataFrame passes (SURVEY
  * §2.D D9 extension — graph centrality beyond the connected-components
  * clustering the near-dup pipeline already runs).
  *
  * Why a training-data engine carries this: link-graph centrality is a
  * standard web-corpus quality prior (the original PageRank use, and the
  * harmonic-centrality filtering of Common Crawl in public LLM-corpus
  * pipelines) — rank a similarity or citation graph, then gate or weight
  * documents by centrality (feeds the same mixture machinery as the
  * quality scores).
  *
  * Scale shape: each iteration is ONE join (ranks ⋈ edges on src) + ONE
  * hash aggregation (contributions by dst) — both on the same edge-key
  * partitioning — plus two scalar aggregates (dangling mass, rank sum)
  * that reduce to the driver. Lineage is cut with `localCheckpoint` every
  * few rounds (the connectedComponents convention), so 10 iterations
  * don't compound into a 10-deep plan. Contribution sums run in
  * DECIMAL(38,18): double addition is order-dependent, decimal is exact,
  * so the ranks are bit-identical under any partitioning (the fit-
  * determinism convention used across this repo).
  *
  * Dangling vertices (no out-edges) redistribute their mass uniformly —
  * the standard correction that keeps total rank mass = n, asserted in
  * PageRankSpec.
  */
object PageRank {

  private val dec = DecimalType(38, 18)

  /** Ranks for every vertex of the DIRECTED edge list: (vertex, rank),
    * total rank mass = vertex count. Edges should be distinct; parallel
    * edges weight a neighbor multiply (documented, matches the classic
    * formulation over multigraphs). */
  def run(
      edges: DataFrame,
      srcCol: Column,
      dstCol: Column,
      iterations: Int = 10,
      damping: Double = 0.85,
      checkpointEvery: Int = 3): DataFrame = {
    require(iterations >= 1 && checkpointEvery >= 1)
    val e = edges
      .select(srcCol.cast("long").as("src"), dstCol.cast("long").as("dst"))
      .localCheckpoint() // edges re-read every round: materialize once
    val vertices = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v"))).distinct().localCheckpoint()
    val n = vertices.count()
    // Out-degree per source; vertices absent here are dangling.
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint()

    var ranks = vertices.select(col("v"), lit(1.0).as("rank"))
    var it    = 0
    while (it < iterations) {
      val withDeg = ranks.join(outDeg, ranks("v") === outDeg("src"), "left_outer")
      // Mass parked on dangling vertices this round — redistributed
      // uniformly (one scalar to the driver, decimal-exact).
      val dangling = withDeg
        .filter(col("deg").isNull)
        .agg(coalesce(sum(col("rank").cast(dec)), lit(0).cast(dec)).as("m"))
        .head().getDecimal(0).doubleValue()
      val contribs = withDeg
        .filter(col("deg").isNotNull)
        .join(e, Seq("src"))
        .select(col("dst").as("v"), (col("rank") / col("deg")).cast(dec).as("c"))
        .groupBy(col("v"))
        .agg(sum(col("c")).as("csum"))
      val next = vertices
        .join(contribs, Seq("v"), "left_outer")
        .select(
          col("v"),
          (lit(1.0 - damping) +
            lit(damping) *
            (coalesce(col("csum"), lit(0).cast(dec)).cast("double") + lit(dangling / n)))
            .as("rank"))
      ranks = if ((it + 1) % checkpointEvery == 0 || it == iterations - 1) {
        next.localCheckpoint()
      } else next
      it += 1
    }
    ranks.select(col("v"), col("rank"))
  }
}
