package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998) — the diversity pass of a retrieval stack: from a top-k candidate
  * list, greedily pick items maximizing
  * `λ·relevance − (1−λ)·max-similarity-to-already-picked`, so the final
  * list trades raw relevance for coverage (near-duplicate hits don't crowd
  * out a distinct-but-relevant document).
  *
  * Split of labor (the Jacobi-eigensolve convention): everything
  * DATA-sized — the retrieval ranking that produces the candidates, the
  * pairwise similarity computation — runs distributed; the greedy argmax
  * itself is inherently sequential over the candidate list, so it runs on
  * the driver over the k-row frame (k is top-k-bounded by construction,
  * enforced by `maxCandidates`). k² similarity lookups for k ≤ 1024 is
  * driver-trivial; the operator REFUSES unbounded candidate frames rather
  * than silently collecting data-sized input.
  */
object Mmr {

  /** Greedy MMR selection of `select` items.
    *
    * @param candidates (id, rel) — the bounded retrieval top-k
    * @param sims (id_a, id_b, sim) — pairwise similarities between
    *             candidates (either direction; missing pairs read as 0)
    * @return (sel_rank, doc_id, rel, mmr) in selection order; `mmr` is the
    *         objective value at pick time, rounded to 1e-6 */
  def rerank(
      candidates: DataFrame,
      sims: DataFrame,
      lambda: Double,
      select: Int,
      maxCandidates: Int = 1024
  ): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda out of [0,1]: $lambda")
    val cand = candidates
      .select(col("id").cast("long"), col("rel").cast("double"))
      .as[(Long, Double)]
      .collect() // bounded: top-k candidate list, guarded below
    require(
      cand.length <= maxCandidates,
      s"${cand.length} candidates exceed maxCandidates=$maxCandidates — " +
        "bound the retrieval stage (top-k) before MMR; the greedy argmax is driver-side")
    val simMap = sims
      .select(col("id_a").cast("long"), col("id_b").cast("long"), col("sim").cast("double"))
      .as[(Long, Long, Double)]
      .collect() // ≤ k² rows by the same bound
      .flatMap { case (a, b, s) => Seq((a, b) -> s, (b, a) -> s) }
      .toMap
    val remaining = scala.collection.mutable.LinkedHashMap(cand.sortBy { case (id, r) => (-r, id) }: _*)
    val selected  = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    while (selected.length < math.min(select, cand.length)) {
      val best = remaining.iterator.map { case (id, r) =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.iterator.map(s => simMap.getOrElse((id, s._1), 0.0)).max
        (id, r, lambda * r - (1.0 - lambda) * maxSim)
      }.maxBy { case (id, _, score) => (score, -id) } // ties: lower id wins
      selected += best
      remaining.remove(best._1)
    }
    selected.toSeq.zipWithIndex
      .map { case ((id, r, sc), i) =>
        (i + 1L, id, math.rint(r * 1e6) / 1e6, math.rint(sc * 1e6) / 1e6)
      }
      .toDF("sel_rank", "doc_id", "rel", "mmr")
  }
}
