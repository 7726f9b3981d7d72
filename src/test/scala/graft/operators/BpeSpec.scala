package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The classic Sennrich fixture: {low×5, lower×2, newest×6, widest×3}. */
  private def corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")
  ).toDF("doc_id", "text")

  test("train learns the classic merge sequence with deterministic ties") {
    val m = Bpe
      .train(corpus, col("text"), 6)
      .as[(Int, String, String, String, Long)]
      .collect()
      .sortBy(_._1)
      .toList
    // Hand-computed: max pair count 9 is a 3-way tie broken (left, right)
    // ascending — (e,s) < (s,t) < (t,</w>).
    assert(m === List(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "est", "</w>", "est</w>", 9L),
      (4, "l", "o", "lo", 7L),
      (5, "lo", "w", "low", 7L),
      (6, "e", "w", "ew", 6L)))
  }

  test("applyMerges greedy-lowest-rank matches the trainer's segmentation") {
    val ranks = Map(
      ("e", "s") -> 1, ("es", "t") -> 2, ("est", "</w>") -> 3,
      ("l", "o") -> 4, ("lo", "w") -> 5, ("e", "w") -> 6)
    def seg(w: String) =
      Bpe.applyMerges(w.map(_.toString).toArray :+ Bpe.EndOfWord, ranks).toList
    assert(seg("newest") === List("n", "ew", "est</w>"))
    assert(seg("low") === List("low", "</w>"))
    assert(seg("lowest") === List("low", "est</w>"))
    // unseen word: only learnable pieces merge
    assert(seg("west") === List("w", "est</w>"))
  }

  test("repeated-symbol merges are non-overlapping left-to-right") {
    val ranks = Map(("a", "a") -> 1)
    assert(Bpe.applyMerges(Array("a", "a", "a", "a", "a"), ranks).toList
      === List("aa", "aa", "a"))
  }

  test("encode ids are consistent with vocab and roundtrip to the text") {
    val merges = Bpe.train(corpus, col("text"), 6)
    val v      = Bpe.vocab(corpus, col("text"), merges)
    val vMap   = v.as[(Long, String)].collect().toMap          // id → symbol
    val idsOf  = vMap.map(_.swap)                              // symbol → id
    // extra doc: unseen char 'z' must encode as UNK yet keep its position
    val docs = corpus.unionByName(Seq((5L, "zest lowest"), (6L, "")).toDF("doc_id", "text"))
    val e = Bpe
      .encode(docs, col("doc_id"), col("text"), merges, v)
      .as[(Long, Long, Long, Long, String)]
      .collect()
      .sortBy(_._1)
      .toList
    // every-input-doc contract: the empty doc survives as (0,0,0,"")
    assert(e.map(_._1) === List(1L, 2L, 3L, 4L, 5L, 6L))
    assert(e.last === ((6L, 0L, 0L, 0L, "")))
    // doc 5: "zest" → z(unseen), est</w>; "lowest" → low, est</w>
    val d5 = e(4)
    assert(d5._2 === 2L && d5._3 === 4L && d5._4 === 1L)
    val d5ids = d5._5.split(" ").map(_.toLong).toList
    assert(d5ids === List(Bpe.UnkId, idsOf("est</w>"), idsOf("low"), idsOf("est</w>")))
    // roundtrip on fully-covered docs: ids → symbols → text
    e.filter(r => r._4 == 0 && r._2 > 0).foreach { case (docId, _, _, _, ids) =>
      val text = Bpe.joinSubwords(ids.split(" ").map(i => vMap(i.toLong)).toSeq)
      val orig = docs.where(col("doc_id") === docId).select(col("text")).as[String].head()
      assert(text === orig.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" "))
    }
  }

  test("vocab is closed over the training corpus (base alphabet + merges)") {
    val merges = Bpe.train(corpus, col("text"), 6)
    val v      = Bpe.vocab(corpus, col("text"), merges)
    val syms   = v.as[(Long, String)].collect().map(_._2).toSet
    val enc = Bpe.encode(corpus, col("doc_id"), col("text"), merges, v)
    // zero UNK anywhere on the corpus the vocab was built from
    assert(enc.agg(sum(col("n_unk"))).as[Long].head() === 0L)
    assert(syms.contains(Bpe.EndOfWord))
    // ids are dense 1..|V|
    val ids = v.as[(Long, String)].collect().map(_._1).sorted.toList
    assert(ids === (1L to ids.length.toLong).toList)
  }

  test("subword-counted budget selection composes (the d7_bpe_budget shape)") {
    val docs   = corpus.withColumn("source", (col("doc_id") % 2).cast("string"))
    val merges = Bpe.train(corpus, col("text"), 6)
    val v      = Bpe.vocab(corpus, col("text"), merges)
    val enc    = Bpe.encode(corpus, col("doc_id"), col("text"), merges, v)
    // Subwords can only split words, never fuse across them: every doc
    // has n_subwords >= n_words — the under-count the whitespace-keyed
    // budget suffers from, and the reason this composition exists.
    enc.select(col("n_words"), col("n_subwords")).as[(Long, Long)].collect().foreach {
      case (w, sw) => assert(sw >= w, s"$sw subwords < $w words")
    }
    val withBpe = docs.join(enc.select(col("doc_id"), col("n_subwords")), "doc_id")
    val budget  = 20L
    val sel = Mixture
      .sampleToTokenBudget(withBpe, col("doc_id"), col("source"), col("n_subwords"), budget)
      .select(col("source"), col("n_subwords"))
      .as[(String, Long)]
      .collect()
    // Greedy prefix fill: every source gets at least its first doc, and
    // the selected mass can overshoot by at most one document.
    val bySource = sel.groupBy(_._1)
    assert(bySource.keySet === Set("0", "1"))
    bySource.foreach { case (src, rows) =>
      val total = rows.map(_._2).sum
      val max   = rows.map(_._2).max
      assert(total - max < budget, s"source $src: $total exceeds budget by more than one doc")
    }
  }

  // --- byte-level tier --------------------------------------------------

  test("byte map is a bijection and byte symbolization roundtrips any unicode text") {
    assert(Bpe.byteToChar.distinct.length === 256, "byte→char table not injective")
    Seq("hello world", "café naïve", "日本語テスト", "emoji 😀 mixed",
        "tabs\tand\nnewlines", "").foreach { s =>
      assert(Bpe.joinByteSymbols(Bpe.byteSymbolize(s).toSeq) === s)
    }
  }

  test("pre-tokenizer matches concatenate back to the input (total coverage)") {
    val p = java.util.regex.Pattern.compile(Bpe.PretokenPattern)
    Seq("It's a test, isn't it?  2nd try... café!", "  leading  spaces",
        "digits123mixed, 42 a'll we'll") .foreach { s =>
      val m  = p.matcher(s)
      val sb = new StringBuilder
      while (m.find()) sb ++= m.group()
      assert(sb.toString === s, s"pretokenizer dropped characters of '$s'")
    }
    // contraction + space-prefix shapes, the GPT-2 signature behavior
    def toks(s: String) = {
      val m = p.matcher(s); val b = Seq.newBuilder[String]
      while (m.find()) b += m.group(); b.result()
    }
    assert(toks("isn't it") === Seq("isn", "'t", " it"))
    assert(toks("a 42x") === Seq("a", " 42", "x"))
  }

  test("trainBytes merges are deterministic and encodeBytes matches trainer segmentation") {
    val m1 = Bpe.trainBytes(corpus, col("text"), 8).as[(Int, String, String, String, Long)]
      .collect().sortBy(_._1).toList
    val m2 = Bpe.trainBytes(corpus.repartition(7), col("text"), 8)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toList
    assert(m1 === m2, "byte-level merge table depends on partitioning")
    // greedy encode of a trained-on pretoken reproduces one whole-word
    // symbol chain consistent with the merges: encoding is UNK-free and
    // token counts are bounded by byte counts
    val enc = Bpe.encodeBytes(corpus, col("doc_id"), col("text"), Bpe.trainBytes(corpus, col("text"), 8))
      .as[(Long, Long, Long, String)].collect()
    enc.foreach { case (_, nPre, nTok, ids) =>
      assert(nTok >= nPre, "merges fused across pretoken boundaries")
      assert(ids.split(" ").forall(s => s.nonEmpty && s.toLong >= 1L), "byte encoding emitted UNK")
    }
  }

  test("byte-counted budget selection is UNK-free where the char tier miscounts (d7_bpe_budget basis)") {
    // a planted doc of UNSEEN non-ASCII words: the char tier collapses
    // each OOV word to ONE <unk> (under-counting exactly what a budget
    // ledger must not), while the byte tier's closed 256-symbol alphabet
    // counts every octet — the reason d7_bpe_budget keys off encodeBytes
    val docs = corpus
      .unionByName(Seq((9L, "日本語 født Müßig")).toDF("doc_id", "text"))
      .withColumn("source", (col("doc_id") % 2).cast("string"))
    val cMerges = Bpe.train(corpus, col("text"), 6) // trained WITHOUT doc 9
    val cVocab  = Bpe.vocab(corpus, col("text"), cMerges)
    val cEnc = Bpe.encode(docs, col("doc_id"), col("text"), cMerges, cVocab)
      .select(col("doc_id"), col("n_subwords"), col("n_unk"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(cEnc(9L)._2 > 0, "char tier should UNK on unseen non-ASCII words")

    val bMerges = Bpe.trainBytes(corpus, col("text"), 6)
    val bEnc = Bpe.encodeBytes(docs, col("doc_id"), col("text"), bMerges)
    val b9 = bEnc.filter(col("doc_id") === 9L)
      .select(col("n_pretok"), col("n_tokens")).as[(Long, Long)].head()
    // UNK-free accounting: the unseen doc's byte-token count reflects its
    // full multi-byte mass (strictly more tokens than the char tier's
    // unk-collapsed subword count), and every pretoken yields >= 1 token
    assert(b9._2 >= b9._1, "a pretoken vanished from the byte count")
    assert(b9._2 > cEnc(9L)._1 - cEnc(9L)._2,
      "byte tier did not out-count the char tier's non-UNK remainder")

    // the budget composition (re-keyed d7_bpe_budget): per-source greedy
    // fill over byte counts — overshoot bounded by one doc, as with chars
    val withTok = docs.join(bEnc.select(col("doc_id"), col("n_tokens")), "doc_id")
    val budget  = 30L
    val sel = Mixture
      .sampleToTokenBudget(withTok, col("doc_id"), col("source"), col("n_tokens"), budget)
      .select(col("source"), col("n_tokens")).as[(String, Long)].collect()
    sel.groupBy(_._1).foreach { case (src, rows) =>
      val total = rows.map(_._2).sum
      assert(total - rows.map(_._2).max < budget,
        s"source $src: $total exceeds byte-token budget by more than one doc")
    }
  }

  test("byte-level encoding roundtrips non-ASCII exactly and never emits UNK") {
    val docs = Seq((1L, "café déjà vu"), (2L, "日本語 text"), (3L, "")).toDF("doc_id", "text")
    val merges = Bpe.trainBytes(docs, col("text"), 10)
    val vocab  = Bpe.vocabBytes(merges)
    val symOf  = vocab.as[(Long, String)].collect().map { case (i, s) => (i, s) }.toMap
    val enc    = Bpe.encodeBytes(docs, col("doc_id"), col("text"), merges)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    val texts  = docs.as[(Long, String)].collect().toMap
    enc.foreach { case (id, _, _, ids) =>
      val syms = if (ids.isEmpty) Seq.empty[String] else ids.split(" ").toSeq.map(s => symOf(s.toLong))
      assert(Bpe.joinByteSymbols(syms) === texts(id), s"doc $id did not roundtrip")
    }
    // non-ASCII pays multi-byte fertility at the byte tier: 日本語 is 3
    // chars but 9 bytes, so with few merges tokens exceed characters
    val jp = enc.find(_._1 == 2L).get
    assert(jp._3 > "日本語 text".length, "byte tier did not reflect multi-byte cost")
  }
}
