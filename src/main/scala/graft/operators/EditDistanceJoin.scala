package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-level edit-distance similarity join (SURVEY.md §2.D D2
  * extension) — the record-linkage primitive the token-level family
  * (MinHash/SimHash/n-gram Jaccard) can't express: "all pairs within k
  * single-character edits", the right tool for near-identical IDs, URLs,
  * titles, and OCR/typo variants.
  *
  * Algorithm = partition-based PassJoin (Li, Deng & Feng, "PASS-JOIN: a
  * partition-based method for similarity joins", PVLDB 2011),
  * re-expressed as keyed DataFrame shuffles — never an all-pairs product:
  *
  *  1. INDEX side: split every string into k+1 contiguous segments (fixed
  *     convention: for length l, the first segments get ⌊l/(k+1)⌋ chars
  *     and the last l mod (k+1) segments one extra). Pigeonhole: k edits
  *     touch at most k segments, so any string within edit distance k
  *     contains at least one segment VERBATIM, shifted by at most k
  *     (net insertions/deletions before the untouched segment ≤ k).
  *  2. PROBE side: for each string, for each candidate partner length
  *     lb ∈ [len−k, len+k] and segment slot i, emit the substrings at the
  *     ≤ 2k+1 start positions the shift bound allows. Join probe keys to
  *     index keys on (substring, slot, partner-length) — an equi-join
  *     whose keys are ~(len/(k+1))-char EXACT segment matches, selective
  *     even on corpora with a flat q-gram frequency profile (where
  *     frequency-ordered prefix filtering à la Ed-Join degenerates: a
  *     uniform synthetic corpus produced ~10⁷ prefix candidates for a
  *     25-pair answer; PassJoin's aligned-segment keys produce ~the
  *     answer).
  *  3. Verify every distinct candidate with a banded `levenshtein`
  *     (threshold form — O(k·len) per pair, early exit past k).
  *
  * Strings shorter than `max(2(k+1), 8)` chars have degenerate (≤1-char)
  * segments, so they route through width-(k+1) LENGTH-BUCKET keys
  * instead (own bucket + successor — any pair with |Δlen| ≤ k lands in
  * equal or adjacent buckets). A qualifying short/long boundary pair has
  * both sides under `shortMin + k`, so both emit bucket keys; pairs with
  * both sides ≥ shortMin are covered by the segment route. Blocking is
  * therefore COMPLETE at every length, and every candidate is verified —
  * the result is EXACT.
  *
  * 100 TB shape: segment indexing, probe generation, and the candidate
  * join are keyed shuffles; nothing is collected and no unblocked cross
  * product exists at any size (PlanSpec's global CartesianProduct guard
  * covers the registered query). Probe fan-out is O(k²) keys per string:
  * (2k+1) lengths × (k+1) slots × the paper's multi-match-aware position
  * window (≤ k+1 wide — a shift of s forces |s| prefix edits and
  * |Δlen − s| suffix edits, so |s| + |Δlen − s| ≤ k).
  * Worst-case candidate volume tracks true duplicate mass — corpora
  * where everything matches everything produce quadratic OUTPUT, which
  * no join strategy avoids.
  */
object EditDistanceJoin {

  /** All unordered pairs (id_a < id_b) with levenshtein(s_a, s_b) ≤
    * maxDist, as (id_a, id_b, ed). Exact — blocking is complete, and every
    * candidate is verified with the real edit distance. */
  def pairs(df: DataFrame, idCol: Column, strCol: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val k        = maxDist
    val n        = k + 1 // segments
    val shortMin = math.max(2 * n, 8)

    val spark = df.sparkSession
    import spark.implicits._

    // r21 (guide §2.5): adaptive rebalance — the JVM key-generation loops
    // below (O(k²) probe keys per string) and the banded levenshtein
    // verify all inherit this frame's partitioning; a 1-partition scan
    // (single-row-group fixture) serialized them on one core. No-op on
    // well-split inputs.
    val strs = graft.tables.Tables
      .rebalanceForCpuBy(
        df.select(idCol.cast("long").as("id"), strCol.cast("string").as("s"))
          .filter(col("s").isNotNull),
        col("id"))
      .withColumn("len", length(col("s")))

    // Segment geometry for a string of length lb, slot i (0-based):
    //   base = lb div n, rem = lb mod n; slots [0, n-rem) are `base` chars,
    //   the rest base+1; starts are the running sum (0-based here).
    def segLenOf(lb: Int, i: Int): Int = {
      val base = lb / n; val rem = lb % n
      if (i < n - rem) base else base + 1
    }
    def segStartOf(lb: Int, i: Int): Int = {
      val base = lb / n; val rem = lb % n
      if (i < n - rem) i * base
      else (n - rem) * base + (i - (n - rem)) * (base + 1)
    }

    val longStrs = strs.filter(col("len") >= shortMin).as[(Long, String, Int)]

    // Key generation runs as plain JVM loops (the repo's shingleHashesJvm
    // convention — nested `transform` HOF lambdas are interpreted, and at
    // ~O(k²) keys per string the interpreter dominated the join 10:1 in
    // profiling). Output is identical to the declarative twin; the spec's
    // blocked ≡ naive law covers the whole path.

    // Index keys: each long string's own k+1 segments, keyed by
    // (content, slot, own length).
    val indexKeys = longStrs
      .mapPartitions(_.flatMap { case (id, s, len) =>
        Iterator.tabulate(n) { i =>
          (id, s.substring(segStartOf(len, i), segStartOf(len, i) + segLenOf(len, i)) + "|" + i + "|" + len)
        }
      })
      .toDF("id", "key")

    // Probe keys: for every candidate partner length lb ∈ [len−k, len+k]
    // (clipped to indexed lengths) and slot, the substrings within the
    // multi-match-aware shift window: an untouched segment shifted by s
    // forces ≥ |s| edits in the prefix (its length changed by s) and
    // ≥ |d − s| in the suffix (d = len − lb), so |s| + |d − s| ≤ k — a
    // ≤ k+1-wide window instead of the naive ±k's 2k+1.
    val probeKeys = longStrs
      .mapPartitions(_.flatMap { case (id, s, len) =>
        val out = Seq.newBuilder[(Long, String)]
        var lb = math.max(len - k, shortMin)
        while (lb <= len + k) {
          val d     = len - lb
          val slack = (k - math.abs(d)) / 2
          var i     = 0
          while (i < n) {
            val sl = segLenOf(lb, i)
            val st = segStartOf(lb, i)
            var p  = math.max(0, st + math.min(0, d) - slack)
            val hi = math.min(len - sl, st + math.max(0, d) + slack)
            while (p <= hi) {
              out += ((id, s.substring(p, p + sl) + "|" + i + "|" + lb))
              p += 1
            }
            i += 1
          }
          lb += 1
        }
        out.result().iterator
      })
      .toDF("id", "key")

    val segmentPairs = probeKeys
      .as("p")
      .join(indexKeys.as("x"), col("p.key") === col("x.key") && col("p.id") =!= col("x.id"))
      .select(
        least(col("p.id"), col("x.id")).as("id_a"),
        greatest(col("p.id"), col("x.id")).as("id_b"))

    // Short-string route: width-(k+1) length buckets, own + successor.
    // Everything under shortMin + k participates, so short/long boundary
    // pairs meet inside the bucket keys.
    val shortPairsKeys = strs
      .filter(col("len") < shortMin + k)
      .select(
        col("id"),
        explode(
          array(
            concat(lit("S"), floor(col("len") / n)),
            concat(lit("S"), floor(col("len") / n) + 1))).as("key"))
    val shortPairs = shortPairsKeys
      .as("l")
      .join(shortPairsKeys.as("r"), col("l.key") === col("r.key") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))

    val candidates = segmentPairs.unionByName(shortPairs).distinct()

    val a = strs.select(col("id").as("id_a"), col("s").as("s_a"), col("len").as("len_a"))
    val b = strs.select(col("id").as("id_b"), col("s").as("s_b"), col("len").as("len_b"))
    candidates
      .join(a, "id_a")
      .join(b, "id_b")
      .filter(abs(col("len_a") - col("len_b")) <= k)
      // Banded verify: threshold levenshtein returns -1 past maxDist and
      // costs O(maxDist·len) instead of O(len²) per candidate.
      .withColumn("ed", levenshtein(col("s_a"), col("s_b"), k))
      .filter(col("ed") >= 0)
      .select(col("id_a"), col("id_b"), col("ed").cast("long").as("ed"))
  }
}
