package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the DRIVER CONTRACT itself (SparkEntry): the correctness gate
  * compares `queries` against `oracleSql` BY KEY, so two silent failure
  * modes exist that no query-level test can catch:
  *
  *  - an oracle whose key matches no query never runs — dead weight that
  *    reads as coverage;
  *  - a query whose oracle key is TYPO'D silently degrades from
  *    hash-compared to rows-only, weakening the gate without any red.
  *
  * The rows-only set is therefore PINNED: every entry is a deliberate
  * design decision (engine-RNG sampling, hash-family-dependent sketches,
  * iterative fixpoints, JVM codec float paths — each carries a law spec
  * instead). Growing it requires editing this list, i.e. making the
  * decision visibly. */
class ContractSpec extends AnyFunSuite {

  /** Queries DELIBERATELY without a DuckDB twin, each law-tested. */
  private val rowsOnlyByDesign: Set[String] = Set(
    "a4_gunzip_roundtrip",
    "c10_percentile_approx",
    "c12_approx_distinct",
    "c12_hll_shard_merge",
    "c31_sample",
    "d5_bpe_bytes",
    "d5_bpe_encode",
    "d5_bpe_train",
    "d5_heavy_hitters",
    "d7_bpe_budget",
    "d8_image_phash",
    "d8_image_resize")

  /** Queries whose oracle is ARTIFACT-BACKED (LlmQueries.indexOracleSql):
    * emitted only after the session materialized the index/model/edge
    * artifacts the SQL reads back — i.e. in every Verify run, where the
    * driver's gate hash-checks them, but NOT in this artifact-free test
    * JVM. Pinned separately so a typo'd key still fails here. */
  private val artifactOracles: Set[String] = Set(
    "c38_cdc_maint_plan",  // manifest-parquet dirty rows (partitionsOracleSql)
    "c38_cdc_partitions",  // manifest-parquet aggregate (partitionsOracleSql)
    "d1_bloom_audit",      // per-key bloom verdicts (bloomVerdictsFor)
    "d9_kcore",            // unrolled peel over the edge artifact
    "d0_corpus_prep",      // near-dup loser-id artifact (d0LosersFor)
    "d0_corpus_prep_full", // train-slice loser-id artifact
    "d0_corpus_prep_incr", // cross-store + within-shard loser artifact
    "d2_fuzzy_decontam",   // cross-corpus band buckets (fuzzyDecontamBucketsFor)
    "d2_neardup_minhash",  // band-bucket rows (neardupBucketsFor)
    "d2_neardup_oph",      // one-permutation band-bucket rows
    "d2_simhash",          // per-doc sketches (simhashFor)
    "d2_source_overlap",   // per-doc signatures (sourceSigsFor)
    "d3_pca_whiten",
    "d3_procrustes_align", // stored-rotation mapping panel (procrustesModelFor)
    "d4_ivf_drift",
    "d4_recall_report",
    "d4_topk_ivf",
    "d4_topk_ivf_filtered",
    "d4_topk_ivf_q",
    "d4_topk_ivfpq",
    "d4_topk_lsh",
    "d4_topk_opq",
    "d4_topk_pq",
    "d9_label_prop",
    "d9_pagerank",
    "d9_semantic_clusters_kmeans",
    "d9_semantic_clusters_lsh") // hyperplane bucket rows (semLshBucketsFor)

  test("every oracle key names a registered query (an orphan oracle never runs)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: ${orphans.toSeq.sorted.mkString(", ")}")
  }

  test("the rows-only set is exactly the pinned by-design list — a typo'd oracle " +
      "key must fail here, not silently weaken the gate") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // artifact-backed oracles may be in EITHER state here: absent when no
    // suite has built artifacts in this JVM yet, present when one has
    // (e.g. PlanSpec materializes every query) — suite order must not
    // decide this test, so only their REGISTRATION is asserted
    val unexpected = rowsOnly -- rowsOnlyByDesign -- artifactOracles
    val missing = rowsOnlyByDesign -- rowsOnly
    val unknown = artifactOracles -- SparkEntry.queries.keySet
    assert(unknown.isEmpty,
      s"artifact-oracle names that are not registered queries: " +
        unknown.toSeq.sorted.mkString(", "))
    assert(unexpected.isEmpty,
      "queries lost their oracle (typo'd key, or add them to the pinned list " +
        s"WITH a law spec): ${unexpected.toSeq.sorted.mkString(", ")}")
    assert(missing.isEmpty,
      s"pinned rows-only queries now have oracles (or were removed) — update the list: " +
        missing.toSeq.sorted.mkString(", "))
  }

  test("query names follow the §2 row-id convention the judge lines up against") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("^[a-e]\\d+[a-z0-9_]*$"))
    assert(bad.isEmpty, s"off-convention query names: ${bad.toSeq.sorted.mkString(", ")}")
  }
}
