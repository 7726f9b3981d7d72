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
    // r21 (guide §1.2 algorithm, §2.4 remove shuffles): the old loop paid
    // TWO extra executions of the ranks⋈outDeg join per round — a
    // separate driver `.head()` action just for the dangling-mass scalar,
    // and the same join re-evaluated inside the next-rank plan — plus it
    // let 3 rounds of lineage pile up between checkpoints, so rounds 2-3
    // re-executed their predecessors' joins again for the dangling action.
    // Restructured: (a) the vertex frame carries the STATIC out-degree, so
    // the per-round dangling mass is a filter+agg on the checkpointed rank
    // frame (no join, and it rides the plan as a broadcast scalar via
    // crossJoin instead of a per-round driver action); (b) each round is
    // ONE eager localCheckpoint action executing the round's join+agg
    // exactly once. Ranks are bit-identical: the decimal sums, the
    // decimal→double casts and the double arithmetic are the same ops in
    // the same order (PageRankSpec + the DuckDB oracle pin this).
    val vertices = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v"))).distinct()
    // Out-degree per vertex; deg NULL = dangling. Static across rounds.
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val verts = vertices
      .join(outDeg, vertices("v") === outDeg("src"), "left_outer")
      .select(col("v"), col("deg"))
      .localCheckpoint()
    val n = verts.count()

    var ranks = verts.select(col("v"), col("deg"), lit(1.0).as("rank")).localCheckpoint()
    var it    = 0
    while (it < iterations) {
      // Mass parked on dangling vertices this round — redistributed
      // uniformly (decimal-exact sum, divided in double exactly like the
      // old driver-side `dangling / n`).
      val dangling = ranks
        .filter(col("deg").isNull)
        .agg(coalesce(sum(col("rank").cast(dec)), lit(0).cast(dec)).as("m"))
        .select((col("m").cast("double") / lit(n.toDouble)).as("dm"))
      val contribs = ranks
        .filter(col("deg").isNotNull)
        .join(e, ranks("v") === e("src"))
        .select(col("dst").as("v"), (col("rank") / col("deg")).cast(dec).as("c"))
        .groupBy(col("v"))
        .agg(sum(col("c")).as("csum"))
      val next = verts
        .join(contribs, Seq("v"), "left_outer")
        .crossJoin(broadcast(dangling))
        .select(
          col("v"),
          col("deg"),
          (lit(1.0 - damping) +
            lit(damping) *
            (coalesce(col("csum"), lit(0).cast(dec)).cast("double") + col("dm")))
            .as("rank"))
      ranks = next.localCheckpoint()
      it += 1
    }
    ranks.select(col("v"), col("rank"))
  }
}
