package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Token-budget mixture sampling laws: minimal covering prefix per slice,
  * whole-slice keep under the budget, determinism. */
class MixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read
    .parquet(s"${TestSpark.sf0001}/documents.parquet")
    .withColumn("n_tok", size(graft.functions.TextOps.tokens(col("text"))).cast("long"))

  test("each slice's kept set covers the budget minimally (or is the whole slice)") {
    val budget = 300L
    val kept = Mixture
      .sampleToTokenBudget(docs, col("doc_id"), col("source"), col("n_tok"), budget)
      .select(col("source"), col("doc_id"), col("n_tok"),
        Mixture.shuffleKey(col("doc_id")).as("h"))
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1)
    val totals = docs.groupBy("source").agg(sum("n_tok").as("t"))
      .as[(String, Long)].collect().toMap
    assert(kept.nonEmpty)
    kept.foreach { case (src, rows) =>
      val keptSum = rows.map(_._3).sum
      if (keptSum < budget)
        assert(keptSum === totals(src), s"$src under budget but not the whole slice")
      else {
        // minimality: dropping the LAST kept doc (max (h, id)) goes under.
        val lastTok = rows.maxBy(r => (r._4, r._2))._3
        assert(keptSum - lastTok < budget, s"$src kept a doc beyond budget coverage")
      }
    }
  }

  test("sampling is deterministic and slices are independent") {
    val a = Mixture.sampleToTokenBudget(docs, col("doc_id"), col("source"), col("n_tok"), 300L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Mixture.sampleToTokenBudget(docs, col("doc_id"), col("source"), col("n_tok"), 300L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)
    // restricting the input to one slice reproduces exactly that slice's sample
    val one = docs.select("source").distinct().as[String].collect().head
    val full = Mixture.sampleToTokenBudget(docs, col("doc_id"), col("source"), col("n_tok"), 300L)
      .filter(col("source") === one).select("doc_id").as[Long].collect().sorted.toSeq
    val solo = Mixture.sampleToTokenBudget(
      docs.filter(col("source") === one), col("doc_id"), col("source"), col("n_tok"), 300L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(full === solo)
  }

  test("per-slice budgets: each slice honors its own budget; unlisted slices drop") {
    val slices = docs.select("source").distinct().as[String].collect().sorted.toSeq
    val (sA, sB) = (slices.head, slices(1))
    val budgets = Seq((sA, 200L), (sB, Long.MaxValue)).toDF("slice", "budget")
    val kept = Mixture
      .sampleToTokenBudgets(docs, col("doc_id"), col("source"), col("n_tok"), budgets)
      .select("source", "doc_id").as[(String, Long)].collect()
    assert(kept.map(_._1).toSet === Set(sA, sB), "unlisted slices must drop")
    // sB kept whole; sA equals the single-budget sample at 200.
    val bWhole = docs.filter(col("source") === sB).select("doc_id").as[Long].collect().sorted
    assert(kept.filter(_._1 == sB).map(_._2).sorted === bWhole)
    val aSingle = Mixture
      .sampleToTokenBudget(docs.filter(col("source") === sA),
        col("doc_id"), col("source"), col("n_tok"), 200L)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.filter(_._1 == sA).map(_._2).sorted === aSingle)
  }

  test("packSequences: every doc packed once, packs dense from 0, near-budget fill") {
    val max = 500L
    val packed = Mixture
      .packSequences(docs, col("doc_id"), col("source"), col("n_tok"), max)
      .select(col("source"), col("pack_id"), col("doc_id"), col("n_tok"))
      .as[(String, Long, Long, Long)].collect()
    assert(packed.length === docs.count(), "a doc was dropped or duplicated")
    packed.groupBy(_._1).foreach { case (src, rows) =>
      val byPack = rows.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
      val ids    = byPack.keySet
      assert(ids === (0L until ids.size).toSet, s"$src pack ids not dense: $ids")
      // every pack except the last STARTED before the budget boundary, so
      // all but the last hold >= max tokens minus less than one doc... the
      // robust invariant: cumulative layout means packs 0..n-2 each end at
      // or beyond their boundary (they can only overshoot, never undershoot).
      val lastId = ids.max
      byPack.filterKeys(_ != lastId).foreach { case (pid, tok) =>
        assert(tok >= 1L, s"$src pack $pid empty")
      }
      // total conservation
      assert(byPack.values.sum === rows.map(_._4).sum)
    }
    // determinism
    val again = Mixture
      .packSequences(docs, col("doc_id"), col("source"), col("n_tok"), max)
      .select(col("doc_id"), col("pack_id")).as[(Long, Long)].collect().toMap
    assert(packed.map(r => r._3 -> r._2).toMap === again)
  }

  test("a giant budget keeps everything; a zero-ish budget keeps one doc per slice") {
    assert(
      Mixture.sampleToTokenBudget(docs, col("doc_id"), col("source"), col("n_tok"), Long.MaxValue)
        .count() === docs.count())
    // budget 1: the first doc in hash order still survives (covering rule),
    // exactly one per slice.
    val one = Mixture.sampleToTokenBudget(docs, col("doc_id"), col("source"), col("n_tok"), 1L)
    val slices = docs.select("source").distinct().count()
    assert(one.count() === slices)
  }

  test("stratifiedSplit: deterministic, total, stratified within every slice") {
    val split = Mixture.stratifiedSplit(
      docs, col("doc_id"), Seq("train" -> 80, "val" -> 90), "test")
    // Total + deterministic: every doc gets exactly one label, same on rerun.
    val a = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Mixture.stratifiedSplit(docs, col("doc_id"), Seq("train" -> 80, "val" -> 90), "test")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a === b)
    assert(a.size === docs.count())
    // Global fractions near 80/10/10 (hash uniformity; fixture has 100 docs).
    val frac = a.values.groupBy(identity).view.mapValues(_.size.toDouble / a.size).toMap
    assert(math.abs(frac("train") - 0.8) < 0.12, frac.toString)
    assert(frac.getOrElse("val", 0.0) > 0.0 && frac.getOrElse("test", 0.0) > 0.0)
    // Stratification: every source slice contains train docs (uniform hash
    // within slices), and the assignment never depends on the slice.
    val perSource = split.groupBy("source")
      .agg(count(when(col("split") === "train", 1)).as("tr"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
    assert(perSource.forall { case (_, tr, n) => n < 5 || tr > 0 },
      perSource.mkString(", "))
  }

  test("stratifiedSplit rejects non-ascending cut points") {
    intercept[IllegalArgumentException] {
      Mixture.stratifiedSplit(docs, col("doc_id"), Seq("a" -> 90, "b" -> 80), "c")
    }
  }

  test("chunkDocuments: disjoint chunks reassemble the document exactly") {
    // stride == window ⇒ chunks partition the token stream; joining them
    // back must reproduce the tokenized text for every doc.
    val back = Mixture
      .chunkDocuments(docs, col("doc_id"), col("text"), windowTokens = 7, strideTokens = 7)
      .groupBy("doc_id")
      .agg(concat_ws(" ", array_sort(collect_list(struct(col("chunk_id"), col("chunk_text"))))
        .getField("chunk_text")).as("rebuilt"))
    val diff = docs
      .select(col("doc_id"), concat_ws(" ", graft.functions.TextOps.tokens(col("text"))).as("orig"))
      .join(back, "doc_id")
      .filter(col("orig") =!= col("rebuilt"))
      .count()
    assert(diff === 0L)
  }

  test("chunkDocuments: overlap geometry, token accounting, no doc dropped") {
    val w = 10; val s7 = 7
    val chunks = Mixture
      .chunkDocuments(docs, col("doc_id"), col("text"), windowTokens = w, strideTokens = s7)
      .select("doc_id", "chunk_id", "chunk_text", "chunk_toks")
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1)
    val nToks = docs
      .select(col("doc_id"), size(graft.functions.TextOps.tokens(col("text"))).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(chunks.keySet === nToks.keySet, "chunking dropped or invented documents")
    chunks.foreach { case (id, rows) =>
      val n = nToks(id)
      val expected = if (n <= w) 1L else math.ceil((n - w).toDouble / s7).toLong + 1
      assert(rows.length.toLong === expected, s"doc $id: ${rows.length} chunks, want $expected")
      assert(rows.map(_._2).sorted.toSeq === (0L until expected), s"doc $id chunk ids not dense")
      rows.foreach { case (_, cid, text, toks) =>
        val want = math.min(w.toLong, n - cid * s7)
        assert(toks === want, s"doc $id chunk $cid token count")
        assert((if (text.isEmpty) 0 else text.split(" ").length).toLong === want)
      }
    }
    // empty doc → exactly one empty chunk
    val e = Mixture.chunkDocuments(
      Seq((99L, "")).toDF("doc_id", "text"), col("doc_id"), col("text"), 10, 7)
      .as[(Long, Long, String, Long)].collect()
    assert(e.toSeq === Seq((99L, 0L, "", 0L)))
  }

  test("chunkDocuments rejects stride > window") {
    intercept[IllegalArgumentException] {
      Mixture.chunkDocuments(docs, col("doc_id"), col("text"), 10, 11)
    }
  }

  test("globalShuffle: a permutation — every doc exactly once, dense shard positions") {
    val out = Mixture.globalShuffle(docs, col("doc_id"), numShards = 4, seed = 7)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.map(_._1).sorted.toSeq ===
      docs.select("doc_id").as[Long].collect().sorted.toSeq)
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(shard >= 0 && shard < 4)
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq,
        s"shard $shard positions not dense")
    }
  }

  test("temperatureBudgets: T=1 is natural proportions, high T flattens toward uniform") {
    def budgets(t: Double) = Mixture
      .temperatureBudgets(docs, col("source"), col("n_tok"), t, totalBudget = 100000L)
      .select("slice", "slice_toks", "budget_frac", "token_budget")
      .as[(String, Long, Double, Long)].collect()
    val nat = budgets(1.0)
    val total = nat.map(_._2).sum.toDouble
    nat.foreach { case (s, n, frac, _) =>
      assert(math.abs(frac - n / total) < 1e-5, s"T=1 slice $s not natural share")
    }
    // fracs sum to 1, budgets to ~totalBudget (rounding only)
    assert(math.abs(nat.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(nat.map(_._4).sum - 100000L) <= nat.length)
    // High temperature: every slice's share moves toward 1/k, smallest
    // slice strictly gains, largest strictly loses.
    val flat = budgets(100.0).map(r => r._1 -> r._3).toMap
    val k = nat.length
    val (minS, maxS) = (nat.minBy(_._2)._1, nat.maxBy(_._2)._1)
    val natM = nat.map(r => r._1 -> r._3).toMap
    if (minS != maxS) {
      assert(flat(minS) > natM(minS), "small slice not up-sampled at high T")
      assert(flat(maxS) < natM(maxS), "large slice not down-sampled at high T")
    }
    flat.values.foreach(f => assert(math.abs(f - 1.0 / k) < 0.05, s"high-T not ~uniform: $flat"))
    // Output shape feeds sampleToTokenBudgets directly.
    val sampled = Mixture.sampleToTokenBudgets(
      docs, col("doc_id"), col("source"), col("n_tok"),
      Mixture.temperatureBudgets(docs, col("source"), col("n_tok"), 2.0, 1000L)
        .select("slice", "token_budget"))
    assert(sampled.count() > 0)
  }

  test("curriculumOrder: clamped buckets, quality-monotone, dense shuffled positions, reproducible") {
    val scored = docs.select(
      col("doc_id"),
      // spread a deterministic [0,1] score, including both endpoints
      round(pmod(col("doc_id") * 37, lit(101)).cast("double") / 100.0, 6).as("q"))
    val out = Mixture.curriculumOrder(scored, col("doc_id"), col("q"), buckets = 4, seed = 7)
      .select("doc_id", "q", "q_bucket", "pos")
      .as[(Long, Double, Long, Long)].collect()
    // Buckets clamped to [0, 3]; q = 1.0 lands in the TOP bucket, not 4.
    assert(out.forall(r => r._3 >= 0 && r._3 <= 3))
    assert(out.filter(_._2 === 1.0).forall(_._3 === 3L))
    assert(out.map(_._3).distinct.length === 4)
    // Monotone: a higher-quality doc never sits in a lower bucket.
    val sorted = out.sortBy(_._2)
    assert(sorted.sliding(2).forall { case Array(a, b) => a._3 <= b._3 })
    // Dense 1..n positions per bucket, shuffled (not id order).
    out.groupBy(_._3).foreach { case (b, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1L to rows.length).toSeq, s"bucket $b positions not dense")
      val byPos = rows.sortBy(_._4).map(_._1)
      if (rows.length > 3) assert(byPos.toSeq !== byPos.sorted.toSeq, s"bucket $b not shuffled")
    }
    // Partitioning-independent (the reproducibility contract).
    val again = Mixture
      .curriculumOrder(scored.repartition(13), col("doc_id"), col("q"), buckets = 4, seed = 7)
      .select("doc_id", "q", "q_bucket", "pos")
      .as[(Long, Double, Long, Long)].collect()
    assert(out.sorted.toSeq === again.sorted.toSeq)
  }

  test("hierarchical prefix ≡ single window across every caller (budget, packing, shuffle)") {
    // subShards is a pure parallelism knob: subShards = 1 degenerates to
    // the naive one-window-per-partition plan, so every operator built on
    // withPrefixBefore must emit identical rows at any fan-out.
    def rows(df: org.apache.spark.sql.DataFrame, cols: String*): Seq[Seq[Any]] =
      df.select(cols.map(col): _*).collect().map(_.toSeq.toVector).sortBy(_.toString()).toSeq
    for (ss <- Seq(1, 7, 100000)) {
      assert(
        rows(Mixture.sampleToTokenBudget(
          docs, col("doc_id"), col("source"), col("n_tok"), 600L, subShards = ss),
          "doc_id", "source", "n_tok") ===
          rows(Mixture.sampleToTokenBudget(
            docs, col("doc_id"), col("source"), col("n_tok"), 600L, subShards = 256),
            "doc_id", "source", "n_tok"),
        s"sampleToTokenBudget diverged at subShards=$ss")
      assert(
        rows(Mixture.packSequences(
          docs, col("doc_id"), col("source"), col("n_tok"), 256L, subShards = ss),
          "doc_id", "pack_id") ===
          rows(Mixture.packSequences(
            docs, col("doc_id"), col("source"), col("n_tok"), 256L, subShards = 256),
            "doc_id", "pack_id"),
        s"packSequences diverged at subShards=$ss")
      assert(
        rows(Mixture.globalShuffle(docs, col("doc_id"), 4, 7, subShardsPerShard = ss),
          "doc_id", "shard", "pos") ===
          rows(Mixture.globalShuffle(docs, col("doc_id"), 4, 7, subShardsPerShard = 256),
            "doc_id", "shard", "pos"),
        s"globalShuffle diverged at subShardsPerShard=$ss")
    }
  }

  test("curriculumOrder hierarchical rank ≡ single window for any subShards fan-out") {
    // The scale mechanism under test: sub-sharding on the key's HIGH bits
    // is monotone in the key, so per-(bucket, subshard) ranks + running
    // offsets must reproduce the one-window-per-bucket rank exactly —
    // subShards is a pure parallelism knob with zero semantic surface.
    val scored = docs.select(
      col("doc_id"),
      round(pmod(col("doc_id") * 37, lit(101)).cast("double") / 100.0, 6).as("q"))
    def run(ss: Int) = Mixture
      .curriculumOrder(scored, col("doc_id"), col("q"), buckets = 4, seed = 7, subShards = ss)
      .select("doc_id", "q_bucket", "pos")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val single = run(1) // degenerates to the naive single window per bucket
    assert(run(7) === single)
    assert(run(256) === single)
    assert(run(100000) === single) // more sub-shards than rows: all singletons
  }

  test("globalShuffle: reproducible on any partitioning; seed changes the permutation") {
    val a = Mixture.globalShuffle(docs, col("doc_id"), 4, 7)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect().sorted.toSeq
    val b = Mixture.globalShuffle(docs.repartition(13), col("doc_id"), 4, 7)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a === b, "shuffle depends on input partitioning")
    val c = Mixture.globalShuffle(docs, col("doc_id"), 4, 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a !== c, "seed does not change the permutation")
    // and the permutation actually mixes: shard order != id order
    val firstShard = a.filter(_._2 == a.head._2).sortBy(_._3).map(_._1)
    assert(firstShard !== firstShard.sorted, "within-shard order is not shuffled")
  }

  test("FFD packing: conservation, capacity, hand case") {
    val cap = 10L
    val in = Seq(
      (1L, "a", 7L), (2L, "a", 6L), (3L, "a", 4L), (4L, "a", 3L), (5L, "a", 2L),
      (6L, "b", 12L), (7L, "b", 1L)).toDF("doc_id", "slice", "n_tok")
    val out = Mixture
      .packFirstFitDecreasing(in, col("doc_id"), col("slice"), col("n_tok"), cap)
      .as[(String, Long, Long, String, Boolean)].collect()
    // every input exactly once
    assert(out.map(_._2).sorted.toSeq === (1L to 7L))
    // per-pack capacity (oversize singletons exempt)
    val byPack = out.groupBy(_._4)
    byPack.foreach { case (k, items) =>
      if (items.exists(_._5)) assert(items.length === 1, s"oversize pack $k not a singleton")
      else assert(items.map(_._3).sum <= cap, s"pack $k over capacity")
    }
    // hand-run FFD on slice a (desc: 7,6,4,3,2): bins [7,3],[6,4],[2] → 3 bins
    assert(byPack.keys.count(_.startsWith("a/")) === 3)
    assert(out.filter(_._1 == "a").filter(x => Set(1L, 4L).contains(x._2)).map(_._4).distinct.length === 1,
      "7 and 3 share a bin")
    // slice b: oversize 12 alone (flagged), 1 in its own bin
    assert(out.find(_._2 == 6L).get._5 === true)
    assert(out.filter(_._1 == "b").map(_._4).distinct.length === 2)
  }

  test("FFD packing: first-fit tightness and token lower bound; deterministic on any partitioning") {
    val cap = 256L
    val ffd = Mixture
      .packFirstFitDecreasing(docs, col("doc_id"), col("source"), col("n_tok"), cap)
    // First-fit guarantee: within a group, no TWO packs can both be ≤ half
    // full (the later one's items would have fit the earlier), and the
    // group can't use more packs than the ceil(tokens/cap) lower bound
    // times ~2 (any-fit bound). NOTE packSequences is NOT a valid
    // comparison point: it lets a doc straddle the boundary, so its
    // "packs" overflow cap — fewer bins, but not bins an SFT batch can use.
    val packs = ffd
      .as[(String, Long, Long, String, Boolean)].collect()
      .groupBy(r => (r._1, r._4.split("/")(1)))
      .map { case (g, rows) =>
        (g, rows.groupBy(_._4).map { case (_, items) => items.map(_._3).sum }.toSeq)
      }
    packs.foreach { case (g, sizes) =>
      assert(sizes.count(_ <= cap / 2) <= 1, s"group $g: two half-empty packs ${sizes.sorted}")
      val lower = (sizes.sum + cap - 1) / cap
      assert(sizes.length <= 2 * lower, s"group $g: ${sizes.length} packs vs lower bound $lower")
    }
    // FFD must not lose or duplicate docs at fixture scale either
    assert(ffd.count() === docs.count())
    assert(ffd.select("doc_id").distinct().count() === docs.count())
    // repartition invariance (incl. sub-grouped form)
    for (sub <- Seq(1, 4)) {
      val a = Mixture
        .packFirstFitDecreasing(docs, col("doc_id"), col("source"), col("n_tok"), cap, sub)
        .as[(String, Long, Long, String, Boolean)].collect().sortBy(_._2).toSeq
      val b = Mixture
        .packFirstFitDecreasing(docs.repartition(13), col("doc_id"), col("source"), col("n_tok"), cap, sub)
        .as[(String, Long, Long, String, Boolean)].collect().sortBy(_._2).toSeq
      assert(a === b, s"subGroups=$sub not partition-invariant")
    }
  }
}
