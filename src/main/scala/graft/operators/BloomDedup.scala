package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.catalyst.GraftExtensions

/** Bloom-gated incremental dedup (SURVEY.md §2.D1, the 100 TB membership
  * path).
  *
  * Exact incremental dedup of an arriving shard against an existing corpus
  * is an anti-join — at 100 TB that shuffles the corpus's key column every
  * time a shard lands. The membership question ("did we already ingest
  * this text?") doesn't need the join for MOST rows: a Bloom filter over
  * the corpus keys answers "definitely new" with zero false negatives, so
  * only the `might_contain` hits (true duplicates + the εn false
  * positives) ever reach the exact join. The sketch is Spark's own
  * runtime-filter aggregate (registered via [[GraftExtensions]]): built
  * with map-side partial merges in one corpus pass, OR-merge associative
  * and commutative, so the artifact is also incrementally maintainable —
  * OR in each new shard's sketch instead of rebuilding (no deletes, which
  * dedup never needs).
  *
  * Driver traffic is the one sketch value (`numBits/8` bytes, sized by
  * config — 1.2 GiB for 1e9 keys at 1% fp), the same route Spark's
  * InjectRuntimeFilter takes; the probe side is then a narrow map-side
  * filter, no shuffle of either table.
  */
object BloomDedup {

  /** Sketch parameters. Defaults size for fixture scale; at 100 TB set
    * `estItems` to the corpus key count and bits ~ 10× that for ~1% fp. */
  final case class Params(estItems: Long = 4000000L, numBits: Long = 33554432L)

  /** One corpus pass → the serialized Bloom sketch of `xxhash64(keyCol)`.
    * The single collected value is config-bounded (numBits/8 bytes). */
  def buildSketch(corpus: DataFrame, keyCol: Column, p: Params = Params()): Array[Byte] = {
    GraftExtensions.register(corpus.sparkSession)
    corpus
      .agg(
        call_function(
          "graft_bloom_agg", xxhash64(keyCol), lit(p.estItems), lit(p.numBits)).as("bf"))
      .head()
      .getAs[Array[Byte]](0)
  }

  /** Probe column: true iff `keyCol` MIGHT be in the sketch (no false
    * negatives; false positives at the sketch's ε). Foldable sketch
    * literal → evaluated map-side inside whole-stage codegen. */
  def mightContain(sketch: Array[Byte], keyCol: Column): Column =
    call_function("graft_might_contain", lit(sketch), xxhash64(keyCol))

  /** The production op: shard rows NOT already in the corpus, computed as
    * bloom-definite-new ∪ (bloom-candidates ANTI-JOIN corpus) — the exact
    * join runs only over the candidate slice, and the corpus side of it is
    * semi-join-reduced with the same probe before shuffling. Result is
    * exactly the plain anti-join's (law-tested in BloomDedupSpec). */
  def newRows(
      corpus: DataFrame,
      shard: DataFrame,
      corpusKey: Column,
      shardKey: Column,
      p: Params = Params()): DataFrame = {
    val sketch = buildSketch(corpus, corpusKey, p)
    val definiteNew = shard.filter(!mightContain(sketch, shardKey))
    val candidates = shard.filter(mightContain(sketch, shardKey))
    // Reduce the corpus side of the exact join with a SECOND, shard-sized
    // sketch over the candidate keys: the corpus shuffles only rows whose
    // key might occur in this shard (runtime-filter semi-join reduction —
    // at 100 TB this is the difference between shuffling the corpus's key
    // column and shuffling ~|shard| corpus rows).
    val candSketch = buildSketch(candidates, shardKey, p)
    val corpusHits = corpus
      .select(corpusKey.as("__k"))
      .filter(mightContain(candSketch, col("__k")))
    val survivors = candidates.join(corpusHits, shardKey === col("__k"), "left_anti")
    definiteNew.unionByName(survivors)
  }

  /** Audit frame for the registered query: one row of counts telling the
    * whole story — shard size, how much the sketch short-circuited, true
    * duplicates, and the measured false-positive rate. Deterministic
    * (bit-OR sketch, fixed xxhash64 seed) but not SQL-expressible →
    * rows-only with laws in BloomDedupSpec. */
  def auditStats(
      corpus: DataFrame,
      shard: DataFrame,
      corpusKey: Column,
      shardKey: Column,
      p: Params = Params()): DataFrame = {
    val spark = shard.sparkSession
    val sketch = buildSketch(corpus, corpusKey, p)
    val corpusKeys = corpus.select(corpusKey.as("__k")).distinct()
    val flagged = shard
      .select(shardKey.as("__key"), mightContain(sketch, shardKey).as("__maybe"))
      .join(corpusKeys, col("__key") === col("__k"), "left")
      .select(col("__maybe"), col("__k").isNotNull.as("__dup"))
    flagged.agg(
      count(lit(1)).as("shard_total"),
      sum(when(!col("__maybe"), 1L).otherwise(0L)).as("definite_new"),
      sum(when(col("__maybe"), 1L).otherwise(0L)).as("candidates"),
      sum(when(col("__dup"), 1L).otherwise(0L)).as("exact_dups"),
      sum(when(col("__maybe") && !col("__dup"), 1L).otherwise(0L)).as("false_positives"),
      round(
        sum(when(col("__maybe") && !col("__dup"), 1L).otherwise(0L)).cast("double")
          / sum(when(!col("__dup"), 1L).otherwise(0L)).cast("double"),
        6).as("fp_rate"))
  }
}
