package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near dup of 1
    (4L, "completely different document about distributed query engines and shuffles"),
    (5L, "another unrelated text mentioning embeddings vectors and cosine distances")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per content hash and is idempotent") {
    val once  = Dedup.exact(corpus, col("text"), col("doc_id"))
    val ids   = once.select("doc_id").as[Long].collect().sorted
    assert(ids === Array(1L, 3L, 4L, 5L))
    val twice = Dedup.exact(once.drop("content_hash"), col("text"), col("doc_id"))
    assert(twice.count() === once.count())
  }

  test("minhash LSH finds exact and near duplicates, not unrelated pairs") {
    val pairs = Dedup
      .nearDuplicatePairs(corpus, col("doc_id"), col("text"),
        Dedup.MinHashParams(numHashes = 32, numBands = 16, jaccardThreshold = 0.5))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"exact dup pair missing from $pairs")
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)), s"near dup pair missing from $pairs")
    assert(!pairs.contains((4L, 5L)), "unrelated docs flagged as near-dups")
  }

  test("connectedComponents: chains merge, separate components stay apart") {
    // 1-2, 2-3 chain (diameter 2, needs >1 propagation round); 10-11 apart;
    // 20-21-22 star
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L), (20L, 21L), (20L, 22L)).toDF("src", "dst")
    val cc = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(cc(1L) === 1L && cc(2L) === 1L && cc(3L) === 1L)
    assert(cc(10L) === 10L && cc(11L) === 10L)
    assert(cc(20L) === 20L && cc(21L) === 20L && cc(22L) === 20L)
    assert(cc.size === 8)
  }

  test("removeBoilerplateLines strips shared headers, keeps order, never drops docs") {
    val docs = Seq(
      (1L, "SITE HEADER\nunique first article body\nCOOKIE BANNER\nmore unique prose"),
      (2L, "SITE HEADER\nsecond article entirely different\nCOOKIE BANNER"),
      (3L, "SITE HEADER\nthird doc text here\nCOOKIE BANNER"),
      (4L, "SITE HEADER\nCOOKIE BANNER") // nothing but boilerplate
    ).toDF("doc_id", "text")
    val out = Dedup
      .removeBoilerplateLines(docs, col("doc_id"), col("text"), "\n", minDocFrequency = 3L)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L), "a doc vanished")
    assert(out(0)._2 === "unique first article body\nmore unique prose") // order kept
    assert(out(1)._2 === "second article entirely different")
    assert(out(3)._2 === "" && out(3)._3 === 0L) // all-boilerplate doc kept, empty
    // below-threshold repetition survives (df=2 < 3)
    val out2 = Dedup
      .removeBoilerplateLines(
        docs.filter(col("doc_id") <= 2), col("doc_id"), col("text"), "\n", 3L)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out2(0)._2.startsWith("SITE HEADER"), "df=2 line wrongly stripped at threshold 3")
  }

  test("connectedComponents: 200-node path graph converges in O(log n) rounds") {
    // Diameter 199 — min-label propagation would need 199 rounds; the
    // large-star/small-star alternation must finish well inside maxIter=12
    // (≈ log2(200) with slack) and still label every node with the min.
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("src", "dst")
    val cc    = Dedup.connectedComponents(edges, maxIter = 12).as[(Long, Long)].collect().toMap
    assert(cc.size === 200)
    assert(cc.values.toSet === Set(0L), s"labels not fully propagated: ${cc.values.toSet.take(5)}")
  }

  test("connectedComponents throws instead of returning a partial cluster map") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(edges, maxIter = 0).collect()
    }
  }

  test("connectedComponents frees superseded rounds (≤1 leftover checkpoint)") {
    val sc     = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val edges  = (0L until 63L).flatMap(i => Seq((i, 2 * i + 1), (i, 2 * i + 2))).toDF("src", "dst")
    val cc     = Dedup.connectedComponents(edges)
    assert(cc.count() === 127)
    val leaked = sc.getPersistentRDDs.keySet -- before
    // Only the node-universe and final-round checkpoints (which back the
    // returned frame) may remain; every superseded round must have been
    // unpersisted.
    assert(leaked.size <= 2, s"leaked ${leaked.size} persistent RDDs: $leaked")
  }

  test("connectedComponents clusters the fixture near-dup pairs transitively") {
    // 1-2 (exact) and 1-3/2-3 (near): one cluster labeled 1; nothing else.
    val edges = Dedup
      .ngramJaccardPairs(corpus, col("doc_id"), col("text"), shingleSize = 3, threshold = 0.5)
      .select(col("doc_a"), col("doc_b"))
    val cc = Dedup.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(cc.keySet === Set(1L, 2L, 3L))
    assert(cc.values.toSet === Set(1L))
  }

  test("bucket-size cap drops degenerate buckets") {
    // 100 identical docs: every (band,bucket) holds 100 > cap → no pairs.
    val spam = (1L to 100L).map(i => (i, "same spam text repeated in every document body")).toDF("doc_id", "text")
    val p    = Dedup.MinHashParams(maxBucketSize = 50)
    assert(Dedup.nearDuplicatePairs(spam, col("doc_id"), col("text"), p).count() === 0L)
    // with a generous cap the pairs appear
    val p2 = Dedup.MinHashParams(maxBucketSize = 200, jaccardThreshold = 0.9)
    assert(Dedup.nearDuplicatePairs(spam, col("doc_id"), col("text"), p2).count() > 0L)
  }

  test("droppedBuckets surfaces exactly the groups the cap removed (audit completeness)") {
    // Spam cluster (100 identical docs) + the regular corpus: the cap
    // silently removing work MUST be observable — the side output names
    // each oversized (band, bucket) with its size, and together with
    // lshBuckets' kept rows accounts for every banded group exactly once.
    val spam = (101L to 200L).map(i => (i, "same spam text repeated in every document body"))
    val df   = corpus.unionByName(spam.toDF("doc_id", "text"))
    val p    = Dedup.MinHashParams(maxBucketSize = 50)
    val dropped = Dedup.droppedBuckets(df, col("doc_id"), col("text"), p)
      .as[(Int, Long, Long)].collect()
    assert(dropped.nonEmpty, "spam cluster produced no dropped-bucket audit rows")
    assert(dropped.forall(_._3 > 50), "audit reported a bucket the cap would keep")
    assert(dropped.forall(_._3 === 100L), "spam buckets must hold exactly the 100 identical docs")
    // Disjoint + complete: kept groups ∪ dropped groups = all groups.
    val keptGroups = Dedup.lshBuckets(df, col("doc_id"), col("text"), p)
      .select("band", "bucket").distinct().as[(Int, Long)].collect().toSet
    val droppedGroups = dropped.map(d => (d._1, d._2)).toSet
    assert(keptGroups.intersect(droppedGroups).isEmpty)
    // The generous-cap run sees every group the capped run kept or dropped.
    val allGroups = Dedup.lshBuckets(df, col("doc_id"), col("text"), p.copy(maxBucketSize = 10000))
      .select("band", "bucket").distinct().as[(Int, Long)].collect().toSet
    assert(keptGroups.union(droppedGroups) === allGroups)
  }

  test("ngramJaccardPairs: identical docs at 1.0, near docs above threshold") {
    val pairs = Dedup
      .ngramJaccardPairs(corpus, col("doc_id"), col("text"), shingleSize = 3, threshold = 0.5)
      .select("doc_a", "doc_b", "jac").as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 2L)) === 1.0)
    assert(pairs.get((1L, 3L)).exists(_ >= 0.5))
    assert(!pairs.contains((4L, 5L)))
  }

  test("crossNgramJaccardPairs ≡ self-join pairs restricted across the split") {
    // Contamination = n-gram Jaccard between two corpora. Law: splitting a
    // corpus and running the cross operator must yield exactly the
    // self-join pairs with one endpoint on each side (same shingles, same
    // exact counting), and a planted eval doc copied into train must be
    // flagged at jac 1.0.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val eval_ = docs.filter(col("doc_id") % 10 === 0)
    val cross = Dedup
      .crossNgramJaccardPairs(
        train, col("doc_id"), col("text"), eval_, col("doc_id"), col("text"),
        shingleSize = 3, threshold = 0.05)
      .select("train_id", "eval_id", "jac").as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    val fromSelf = Dedup
      .ngramJaccardPairs(docs, col("doc_id"), col("text"), shingleSize = 3, threshold = 0.05)
      .select("doc_a", "doc_b", "jac").as[(Long, Long, Double)].collect()
      .flatMap { case (a, b, j) =>
        if (a % 10 != 0 && b % 10 == 0) Some((a, b) -> j)
        else if (b % 10 != 0 && a % 10 == 0) Some((b, a) -> j)
        else None
      }
      .toMap
    assert(cross === fromSelf, "cross-corpus pairs diverge from the self-join restriction")

    // Planted contamination: an eval doc verbatim in train → jac 1.0.
    val planted = eval_.limit(1).select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    val evalId  = eval_.limit(1).select("doc_id").as[Long].collect().head
    val hit = Dedup
      .crossNgramJaccardPairs(
        train.select("doc_id", "text").unionByName(planted), col("doc_id"), col("text"),
        eval_, col("doc_id"), col("text"),
        shingleSize = 3, threshold = 0.5)
      .filter(col("train_id") === evalId + 1000000 && col("eval_id") === evalId)
      .select("jac").as[Double].collect()
    assert(hit.toSeq === Seq(1.0), s"planted eval doc not flagged: ${hit.toSeq}")
  }

  test("rotated simhash blocking recalls at least the single-prefix pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val single = Dedup
      .simHashPairs(docs, col("doc_id"), col("text"), maxHamming = 10, blockBits = 16)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val rotated = Dedup
      .simHashPairsRotated(docs, col("doc_id"), col("text"), maxHamming = 10, blockBits = 16, rotations = 4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(single.subsetOf(rotated), s"rotation lost pairs: ${(single -- rotated).take(5)}")
    // every reported pair is genuinely within radius (exact verify)
    val hams = Dedup
      .simHashPairsRotated(docs, col("doc_id"), col("text"), maxHamming = 10, blockBits = 16, rotations = 4)
      .select("hamming").as[Long].collect()
    assert(hams.forall(_ <= 10))
  }

  test("simhash pairs: exact dups at hamming 0, near dups within radius") {
    val pairs = Dedup
      .simHashPairs(corpus, col("doc_id"), col("text"), maxHamming = 16, blockBits = 4)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m.get((1L, 2L)).contains(0L), s"exact dup should be hamming 0: $m")
  }

  test("exactNgramDecontam counts exactly the shared verbatim k-grams") {
    // Hand-checkable corpus: train doc 1 shares the trigrams of "a b c d"
    // with eval doc 10 ("a b c", "b c d" → 2 hits out of its 4 distinct
    // trigrams); train doc 2 shares nothing; doc 3 is shorter than k and
    // must be ignored even though its text occurs verbatim in eval.
    val train = Seq(
      (1L, "a b c d x y"),        // trigrams: abc bcd cdx dxy
      (2L, "p q r s t"),          // no overlap with eval
      (3L, "a b")                 // < k tokens: no k-grams, dropped
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, "z z a b c d"),       // contains abc, bcd
      (11L, "a b")                // < k tokens on the eval side too
    ).toDF("doc_id", "text")
    val out = Dedup
      .exactNgramDecontam(
        train, col("doc_id"), col("text"), eval_, col("doc_id"), col("text"), shingleSize = 3)
      .select("train_id", "n_sh", "n_hits", "contaminated_frac")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet === Set(1L), s"only doc 1 overlaps: $out")
    assert(out(1L) === ((4L, 2L, 0.5)))

    // Planted verbatim eval doc in train → every k-gram hits (frac 1.0).
    val docs   = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val evalDf = docs.filter(col("doc_id") % 10 === 0)
    val one    = evalDf.orderBy("doc_id").limit(1)
    val oneId  = one.select("doc_id").as[Long].collect().head
    val flagged = Dedup
      .exactNgramDecontam(
        docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text")
          .unionByName(one.select((col("doc_id") + 1000000).as("doc_id"), col("text"))),
        col("doc_id"), col("text"), evalDf, col("doc_id"), col("text"), shingleSize = 3)
      .filter(col("train_id") === oneId + 1000000)
      .select("contaminated_frac").as[Double].collect()
    assert(flagged.toSeq === Seq(1.0), s"planted verbatim eval doc not fully flagged: ${flagged.toSeq}")
  }

  test("fuzzyDecontamFlags: exact and near eval leaks flagged, unrelated not; flags ⊆ exact pairs") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),   // verbatim leak of eval 10
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup leak
      (3L, "completely different document about distributed query engines and shuffles")
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      (11L, "benchmark prompt concerning astronomy telescopes and orbital mechanics")
    ).toDF("doc_id", "text")
    val p = Dedup.MinHashParams(numHashes = 32, numBands = 16, jaccardThreshold = 0.5)
    val flags = Dedup
      .fuzzyDecontamFlags(train, col("doc_id"), col("text"), eval_, col("doc_id"), col("text"), p)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(flags.contains(1L) && flags(1L)._1 === 10L && flags(1L)._2 === 1.0,
      s"verbatim leak not flagged at jaccard 1.0: $flags")
    assert(flags.contains(2L) && flags(2L)._1 === 10L, s"near-dup leak not flagged: $flags")
    assert(!flags.contains(3L), s"clean doc falsely flagged: $flags")
    // Containment: every flag is backed by an exact cross-corpus pair at
    // the same threshold (LSH only GENERATES candidates; verification is
    // exact, so no flag can exceed what the exact pass would emit).
    val exact = Dedup
      .crossNgramJaccardPairs(
        train, col("doc_id"), col("text"), eval_, col("doc_id"), col("text"),
        shingleSize = 1, threshold = 0.5)
      .select("train_id", "eval_id").as[(Long, Long)].collect().toSet
    flags.foreach { case (t, (e, _)) =>
      assert(exact.contains((t, e)), s"flag ($t,$e) has no exact-Jaccard counterpart")
    }
  }

  test("duplicateSpanRemoval cuts the later copy of a shared span and merges overlapping windows") {
    // Doc 2 embeds doc 1's 6-token run "alpha … zeta" at positions 2..7.
    // With k=3 the four shared trigram windows in doc 2 (pos 2,3,4,5) are
    // flagged — doc 1 holds every canonical occurrence — and must merge
    // into the single span [2,7]; doc 1 and the unrelated doc 3 pass
    // through untouched.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta unique one two three"),
      (2L, "intro words alpha beta gamma delta epsilon zeta outro close"),
      (3L, "totally different text with no repeats at all here")
    ).toDF("doc_id", "text")
    val out = Dedup
      .duplicateSpanRemoval(docs, col("doc_id"), col("text"), k = 3)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toList
    assert(out(0) === ((1L, "alpha beta gamma delta epsilon zeta unique one two three", 10L, 0L)))
    assert(out(1) === ((2L, "intro words outro close", 4L, 6L)))
    assert(out(2)._1 === 3L && out(2)._4 === 0L)
  }

  test("duplicateSpanRemoval keeps the first occurrence of a WITHIN-doc repeat") {
    // "x y z" occurs at pos 0 (canonical) and pos 5 → only the second
    // occurrence's window [5,7] is cut.
    val docs = Seq((7L, "x y z pad pad x y z")).toDF("doc_id", "text")
    val out = Dedup
      .duplicateSpanRemoval(docs, col("doc_id"), col("text"), k = 3)
      .as[(Long, String, Long, Long)].collect().head
    assert(out === ((7L, "x y z pad pad", 5L, 3L)))
  }

  test("duplicateSpanRemoval passes short, empty, and unique docs through (no doc dropped)") {
    val docs = Seq(
      (1L, "one two"),            // < k tokens: no windows
      (2L, ""),                   // empty: zero tokens
      (3L, "five distinct tokens right here")
    ).toDF("doc_id", "text")
    val out = Dedup
      .duplicateSpanRemoval(docs, col("doc_id"), col("text"), k = 3)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toList
    assert(out.map(_._1) === List(1L, 2L, 3L), "a doc vanished from the span-dedup output")
    assert(out(0) === ((1L, "one two", 2L, 0L)))
    assert(out(1) === ((2L, "", 0L, 0L)))
    assert(out(2) === ((3L, "five distinct tokens right here", 5L, 0L)))
    assert(out.forall(_._4 === 0L))
  }

  test("containmentPairs: planted excerpt scores 1.0 where Jaccard stays under threshold") {
    val big   = (0 until 400).map(i => s"t${(i * 7919) % 389}").mkString(" ")
    val small = big.split(" ").slice(100, 110).mkString(" ") // 10-token excerpt
    val docs  = Seq((1L, big), (2L, small), (3L, "entirely different words here now")).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, col("doc_id"), col("text"), 3, 0.5)
      .as[(Long, Long, Double, Double)].collect()
    val hit = cont.find(p => p._1 == 1L && p._2 == 2L)
    assert(hit.isDefined, s"excerpt pair not found in ${cont.toSeq}")
    assert(hit.get._4 === 1.0, "into-excerpt containment must be exactly 1.0")
    assert(hit.get._3 < 0.5, "into-big containment must stay small")
    val jac = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5).count()
    assert(jac === 0L, "symmetric Jaccard at the same threshold must miss the excerpt")
    assert(!cont.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("cdcChunks: chunks tile the token stream; dense indices; deterministic") {
    val docs = spark.read.parquet(s"${graft.TestSpark.sf0001}/documents.parquet")
    val chunks = Dedup.cdcChunks(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Long, String)].collect()
    val byDoc = chunks.groupBy(_._1)
    val tokCounts = docs
      .select(col("doc_id"), size(graft.functions.TextOps.tokens(col("text"))).cast("long"))
      .as[(Long, Long)].collect().toMap
    byDoc.foreach { case (d, cs) =>
      assert(cs.map(_._2).sorted.toSeq === (0L until cs.length), s"doc $d chunk ids not dense")
      assert(cs.map(_._3).sum === tokCounts(d), s"doc $d chunks don't tile its tokens")
      assert(cs.forall(_._3 >= 1))
    }
    // every tokenized doc emits chunks
    assert(byDoc.keySet === tokCounts.filter(_._2 > 0).keySet)
    val again = Dedup.cdcChunks(docs.repartition(7), col("doc_id"), col("text"))
      .as[(Long, Long, Long, String)].collect()
    assert(chunks.sorted.toSeq === again.sorted.toSeq, "not partition-invariant")
  }

  test("cdcChunks: a prefix insertion only re-keys the head — the CDC shift property") {
    // 600 tokens of deterministic content, then the same text with one
    // token prepended. Fixed-size 16-token blocks would share ZERO block
    // hashes; CDC re-synchronizes at the first boundary after the edit.
    val words = (0 until 600).map(i => s"w${(i * 2654435761L) % 97}")
    val base  = words.mkString(" ")
    val shifted = ("zzz " + base)
    val docs = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Long, String)].collect()
    val h1 = chunks.filter(_._1 == 1L).map(_._4).toSet
    val h2 = chunks.filter(_._1 == 2L).map(_._4).toSet
    val shared = h1.intersect(h2).size
    assert(shared >= (h1.size * 3) / 4,
      s"CDC lost sync: only $shared of ${h1.size} chunks survive a 1-token prefix edit")
  }

  test("shingleHashes (JVM twin) bit-matches the declarative string-shingle pipeline") {
    import graft.functions.TextOps
    // edge shapes: dup docs, multi-space runs, mixed case, non-ASCII,
    // exactly-k tokens, sub-k tokens (must vanish), null text
    val docs = (corpus.as[(Long, String)].collect().toSeq ++ Seq(
      (10L, "Mixed   CASE   tokens  with   runs    of spaces here now ok"),
      (11L, "café déjà vu naïve über straße tokens regarder 中文 内容 also"),
      (12L, "one two three four five"), // exactly k
      (13L, "too short"),               // < k → zero shingles
      (14L, null.asInstanceOf[String])
    )).toDF("doc_id", "text")
    val k = 5

    val jvm = Dedup.shingleHashes(docs, col("doc_id"), col("text"), k)
    // declarative reference: the concat_ws pipeline shingleHashes replaces
    val ref = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("sh",
        when(size(col("toks")) >= k,
          array_distinct(transform(
            sequence(lit(0), size(col("toks")) - k),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(k))))))
          .otherwise(array().cast("array<string>")))
      .select(col("doc_id"), explode(col("sh")).as("s"))

    // per-doc distinct-shingle counts identical
    val nJvm = jvm.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    val nRef = ref.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(nJvm === nRef, "per-doc shingle counts diverge from the declarative pipeline")

    // fingerprinting is injective on this corpus (no FNV collisions) and
    // cross-doc sharing structure is identical: every shingle's doc SET
    // has a hash-side counterpart with the same doc set
    val byStr = ref.as[(Long, String)].collect().groupBy(_._2).map { case (_, v) => v.map(_._1).toSet }
      .groupBy(identity).map { case (k2, v) => (k2, v.size) }
    val byHash = jvm.as[(Long, Long)].collect().groupBy(_._2).map { case (_, v) => v.map(_._1).toSet }
      .groupBy(identity).map { case (k2, v) => (k2, v.size) }
    assert(byHash === byStr, "cross-doc sharing structure diverges (collision or identity drift)")
  }
}
