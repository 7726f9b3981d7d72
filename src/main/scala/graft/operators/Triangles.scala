package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected edge list — the clustering-
  * structure diagnostic for similarity graphs (near-dup and semantic-dup
  * edges): a high triangle density means duplicate clusters are cliques
  * (transitive duplicates, safe to collapse to one representative), while
  * a triangle-free graph of the same degree sequence is chains/stars
  * (transitive closure would over-merge — see the connectedComponents
  * caveat in Dedup.scala).
  *
  * Algorithm: the degree-ordered node-iterator (the MapReduce-classic
  * Cohen / Suri–Vassilvitskii formulation, public since 2011):
  *
  *  1. canonicalize edges (dedupe, drop loops),
  *  2. orient every edge from its lower-(degree, id) endpoint to its
  *     higher one — a total acyclic order,
  *  3. wedges = join oriented edges on their SOURCE (each wedge is the
  *     unique lowest-ranked vertex of its potential triangle),
  *  4. close wedges against the oriented edge list itself.
  *
  * Why orientation matters at scale: out-degree under the (degree, id)
  * order is bounded by O(√m) on ANY graph (a vertex with out-degree d has
  * d neighbors of degree ≥ d, so d² ≤ 2m), so the wedge join fans out to
  * at most m·√m rows regardless of skew — a star node of degree 10⁶
  * produces ZERO wedges instead of 10¹² (every star edge points INTO the
  * hub, because leaves have lower degree). All three steps are plain
  * equi-joins/aggs: map-side combined, AQE-skew-splittable, no driver
  * state. Triangle identity vs the naive id-ordered 3-way self-join is
  * law-checked in TrianglesSpec.
  */
object Triangles {

  private def canonical(edges: DataFrame, a: Column, b: Column): DataFrame = edges
    .select(least(a, b).as("u"), greatest(a, b).as("v"))
    .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
    .distinct()

  /** All triangles, one row per triangle as (x, y, z) with
    * rank(x) < rank(y) < rank(z) in the (degree, id) order — each
    * triangle appears exactly once. */
  def triangles(edges: DataFrame, a: Column, b: Column): DataFrame =
    trianglesCanonical(canonical(edges, a, b).localCheckpoint(true))

  /** Core on an already-canonical (u < v, deduped) edge frame. The input
    * must be materialized by the caller: the edge list is referenced by
    * the degree agg, the two orientation joins, and the closing probe —
    * without a checkpoint Spark re-evaluates the (possibly expensive —
    * shingle-join) edge lineage once per reference (measured 5.5 s → 1.6 s
    * on d9_triangle_count at sf0.1). */
  private def trianglesCanonical(e: DataFrame): DataFrame = {
    val deg = e
      .select(col("u").as("n"))
      .unionAll(e.select(col("v").as("n")))
      .groupBy("n")
      .agg(count(lit(1)).as("deg"))

    // Attach both endpoint degrees, then orient low-(deg, id) → high.
    val withDeg = e
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("deg", "du"), Seq("u"))
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("deg", "dv"), Seq("v"))
    val uLower = (col("du") < col("dv")) || (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uLower, col("u")).otherwise(col("v")).as("src"),
      when(uLower, col("v")).otherwise(col("u")).as("dst"),
      when(uLower, col("dv")).otherwise(col("du")).as("dstDeg"))

    // Wedges around each lowest-ranked vertex; order the two out-
    // neighbors by the SAME (deg, id) rank so the closing edge is probed
    // in its stored orientation. The oriented adjacency is referenced
    // three times (both wedge legs + the closing probe) — materialize it
    // once; it is exactly m rows.
    val orientedCk = oriented.localCheckpoint(true)
    val e1 = orientedCk.select(col("src"), col("dst").as("y"), col("dstDeg").as("yDeg"))
    val e2 = orientedCk.select(col("src"), col("dst").as("z"), col("dstDeg").as("zDeg"))
    val yLower = (col("yDeg") < col("zDeg")) || (col("yDeg") === col("zDeg") && col("y") < col("z"))
    val wedges = e1.join(e2, Seq("src")).filter(yLower)

    wedges
      .join(
        orientedCk.select(col("src").as("y"), col("dst").as("z")),
        Seq("y", "z"))
      .select(col("src").as("x"), col("y"), col("z"))
  }

  /** Per-node triangle participation counts, zero-filled over every node
    * that carries at least one edge (so the output is keyed by the graph,
    * not by the triangle set). Σ counts = 3 · |triangles|. */
  def perNodeCounts(edges: DataFrame, a: Column, b: Column): DataFrame = {
    // ONE materialization of the canonical edge set feeds the node list,
    // the degree agg, and every triangle-side reference.
    val e     = canonical(edges, a, b).localCheckpoint(true)
    val nodes = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n"))).distinct()
    val tri   = trianglesCanonical(e)
    val cnt = tri
      .select(col("x").as("n"))
      .unionAll(tri.select(col("y").as("n")))
      .unionAll(tri.select(col("z").as("n")))
      .groupBy("n")
      .agg(count(lit(1)).as("c"))
    nodes
      .join(cnt, Seq("n"), "left")
      .select(col("n"), coalesce(col("c"), lit(0L)).as("n_triangles"))
  }
}
