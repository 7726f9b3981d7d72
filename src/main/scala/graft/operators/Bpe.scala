package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Byte-pair-encoding tokenizer training and encoding (SURVEY §2.D D5
  * extension) — the full merge-learning loop of Sennrich et al. 2016
  * ("Neural Machine Translation of Rare Words with Subword Units"), not
  * just the word-frequency first pass that [[Vocab]] covers.
  *
  * Training follows the shape every production BPE trainer uses
  * (subword-nmt, HuggingFace tokenizers): the corpus-sized work is ONE
  * distributed pass that reduces 100 TB of text to a word-frequency table
  * bounded by vocabulary growth (Heaps' law — ~10⁷ distinct words even at
  * web scale), truncated to the top `maxWords` by count (the tail it drops
  * is mass the merge counts would barely see). The merge loop itself then
  * runs driver-side over that BOUNDED table — numMerges × total-symbols
  * work on ~10⁵ rows, never touching the corpus again. This is not a
  * driver-side shortcut; it is the algorithm: pair statistics are fully
  * determined by (word, count), so looping over the corpus would recompute
  * identical counts 10⁶ times over.
  *
  * Encoding is embarrassingly parallel: the learned merge table (≤ a few
  * 10⁴ rows by construction) broadcasts, and a `mapPartitions` applies the
  * standard greedy lowest-rank merge per word with a per-partition word
  * cache (Zipf: a handful of frequent words dominate, so most lookups are
  * cache hits). No shuffle at all — the pass is scan → narrow map.
  *
  * Determinism: merge selection is (count desc, (left, right) asc) — the
  * same total order on every run and every partitioning, so the merge
  * table, and therefore every encoded corpus, is bit-stable.
  */
object Bpe {

  /** End-of-word marker symbol (a separate trailing symbol per word, as in
    * Sennrich's reference implementation). Never collides with real text:
    * [[TextOps.tokens]] splits on spaces, so no token contains "</w>". */
  val EndOfWord = "</w>"

  /** UNK id for symbols outside the vocabulary (encode-time chars the
    * training corpus never saw). */
  val UnkId = 0L

  private def symbolize(word: String): Array[String] =
    word.map(_.toString).toArray :+ EndOfWord

  /** Learn `numMerges` BPE merges from the corpus: (rank, left, right,
    * merged, cnt) with rank 1-based in learn order and cnt the weighted
    * pair count that won the rank. The distributed part is the word-count
    * aggregation; the merge loop runs on the collected top-`maxWords`
    * table (see class doc for why that is the algorithm, not a shortcut).
    */
  def train(docs: DataFrame, textCol: Column, numMerges: Int, maxWords: Int = 50000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // ONE corpus pass: explode → partial+final hash agg → top-k by count.
    // (count desc, word asc) makes the truncation boundary deterministic.
    val wordCounts: Array[(String, Long)] = graft.tables.Tables
      .rebalanceForCpu(docs) // tokenize-bound scan; no-op on well-split inputs
      .select(explode(TextOps.tokens(textCol)).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)
      .as[(String, Long)]
      .collect()

    // Driver-side merge loop over the bounded table.
    val words: Array[(Array[String], Long)] =
      wordCounts.map { case (w, c) => (symbolize(w), c) }
    learnMerges(words, numMerges).toDF("rank", "left", "right", "merged", "cnt")
  }

  /** The shared merge-learning loop: numMerges rounds of (count pairs,
    * pick (count desc, pair asc) winner, merge every occurrence) over the
    * bounded symbolized-word table — identical for the char-level and
    * byte-level trainers, which differ only in symbolization. */
  private def learnMerges(
      words: Array[(Array[String], Long)],
      numMerges: Int): Seq[(Int, String, String, String, Long)] = {
    val out = mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    val current = words.map { case (s, c) => (mutable.ArrayBuffer(s: _*), c) }
    while (rank <= numMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      current.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = pairCounts.minBy { case ((a, b), n) => (-n, a, b) }
        val merged      = l + r
        out += ((rank, l, r, merged, c))
        current.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == l && syms(i + 1) == r) {
              syms.update(i, merged)
              syms.remove(i + 1)
              // stay at i: the new symbol may pair with the previous one
              // only on the NEXT sweep (left-to-right single-pass merge,
              // matching the reference implementation); advance normally.
            }
            i += 1
          }
        }
        rank += 1
      }
    }
    out.toSeq
  }

  /** Subword-id vocabulary for a learned merge table: (vocab_id, symbol).
    * Ids are 1-based — the sorted base alphabet of the corpus (every
    * distinct character plus [[EndOfWord]]) first, then the merged symbols
    * in rank order; 0 is reserved for UNK. One cheap distinct-char pass
    * (alphabet-bounded agg) makes the vocab closed over anything encode
    * can emit from this corpus. */
  def vocab(docs: DataFrame, textCol: Column, merges: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val alphabet: Array[String] = docs
      .select(explode(split(concat_ws("", TextOps.tokens(textCol)), "")).as("ch"))
      .where(length(col("ch")) > 0)
      .distinct()
      .as[String]
      .collect()
      .sorted
    val base   = alphabet :+ EndOfWord
    val merged = merges.orderBy(col("rank")).select(col("merged")).as[String].collect()
    (base ++ merged).zipWithIndex
      .map { case (s, i) => ((i + 1).toLong, s) }
      .toSeq
      .toDF("vocab_id", "symbol")
  }

  /** Encode each document against a learned merge table: (doc_id, n_words,
    * n_subwords, n_unk, ids) with `ids` the space-joined subword-id
    * sequence (stringified — the cross-engine checker hashes JSON
    * scalars). Zero-token docs surface as (doc_id, 0, 0, 0, "") per the
    * every-input-doc contract. Merges + vocab broadcast; the pass is a
    * shuffle-free narrow map with a per-partition word cache. */
  def encode(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      merges: DataFrame,
      vocabDf: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val rankOf: Map[(String, String), Int] = merges
      .select(col("left"), col("right"), col("rank"))
      .as[(String, String, Int)]
      .collect()
      .map { case (l, r, k) => ((l, r), k) }
      .toMap
    val idOf: Map[String, Long] =
      vocabDf.select(col("symbol"), col("vocab_id")).as[(String, Long)].collect().toMap
    val bRanks = spark.sparkContext.broadcast(rankOf)
    val bIds   = spark.sparkContext.broadcast(idOf)

    val prepared = graft.tables.Tables
      .rebalanceForCpu(docs) // merge-loop-bound narrow map; no-op on well-split inputs
      .select(idCol.cast("long").as("doc_id"), TextOps.tokens(textCol).as("toks"))
    prepared
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val ranks = bRanks.value
        val ids   = bIds.value
        val cache = mutable.HashMap.empty[String, Array[String]]
        def split(word: String): Array[String] =
          cache.getOrElseUpdate(word, applyMerges(symbolize(word), ranks))
        it.map { case (docId, toks) =>
          val subs = toks.iterator.flatMap(w => split(w)).toArray
          val seq  = subs.map(s => ids.getOrElse(s, UnkId))
          (docId, toks.size.toLong, subs.length.toLong, seq.count(_ == UnkId).toLong,
            seq.mkString(" "))
        }
      }
      .toDF("doc_id", "n_words", "n_subwords", "n_unk", "ids")
  }

  /** Standard greedy BPE application: repeatedly merge the present pair
    * with the LOWEST rank until no learnable pair remains. Exactly the
    * inference rule of subword-nmt / HF tokenizers — encode order mirrors
    * train order, so a word seen at train time re-splits into the same
    * subwords the trainer left it with. */
  private[operators] def applyMerges(
      symbols: Array[String],
      ranks: Map[(String, String), Int]): Array[String] = {
    val syms = mutable.ArrayBuffer(symbols: _*)
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx  = -1
      var i        = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        val merged = syms(bestIdx) + syms(bestIdx + 1)
        // merge EVERY occurrence of the winning pair left-to-right before
        // re-scanning, as the reference implementation does.
        var j = 0
        while (j < syms.length - 1) {
          if (ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue) == bestRank &&
            syms(j) + syms(j + 1) == merged) {
            syms.update(j, merged)
            syms.remove(j + 1)
          } else j += 1
        }
        if (syms.length < 2) done = true
      }
    }
    syms.toArray
  }

  /** Inverse of [[encode]] at the subword-string level: re-assemble text
    * from subword symbols (concatenate, then [[EndOfWord]] → space). Used
    * by the roundtrip law — decode(split(w)) == w for every word. */
  private[operators] def joinSubwords(subwords: Seq[String]): String =
    subwords.mkString("").replace(EndOfWord, " ").trim

  // --- Byte-level BPE (GPT-2 family) -----------------------------------
  //
  // Modern tokenizers (GPT-2, Llama-family) differ from Sennrich'16 in
  // two ways that change token counts exactly where D5/D7 accounting
  // cares: (1) the base alphabet is the 256 BYTES of UTF-8, so non-ASCII
  // text starts multi-symbol per character and there is NO possible UNK;
  // (2) a regex PRE-TOKENIZER (contractions / letter runs / digit runs /
  // punctuation runs, each optionally space-prefixed) bounds merges
  // instead of whitespace words, so punctuation-heavy text splits very
  // differently from the whitespace trainer. Same learned-merge loop.

  /** The GPT-2 pre-tokenizer regex, verbatim semantics: contraction
    * suffixes, space-prefixed letter runs, space-prefixed digit runs,
    * space-prefixed punctuation runs, then whitespace (trailing-space
    * lookahead keeps a single space attached to the following token).
    * Every char of any string is covered by exactly one match, so the
    * match sequence concatenates back to the input — the roundtrip law. */
  val PretokenPattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  /** GPT-2's bijective byte→printable-char table: visible ASCII and the
    * Latin-1 printables map to themselves; the 68 remaining bytes map to
    * 256+n. Keeps merge symbols printable/joinable while staying a
    * bijection (unlike hex-escaping, concatenation stays unambiguous). */
  private[operators] val byteToChar: Array[Char] = {
    val keep = ((('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ')).map(_.toInt)).toSet
    val out  = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (keep(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }
  private[operators] val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => (c, b) }.toMap

  private[operators] def byteSymbolize(pretoken: String): Array[String] =
    pretoken.getBytes("UTF-8").map(b => byteToChar(b & 0xff).toString)

  /** Decode a byte-level symbol sequence back to text: invert the byte
    * map per char, then UTF-8 decode — exact inverse of symbolization,
    * whatever merges produced the symbols. */
  private[operators] def joinByteSymbols(symbols: Seq[String]): String = {
    val bytes = symbols.flatMap(_.map(c => charToByte(c).toByte)).toArray
    new String(bytes, "UTF-8")
  }

  /** Learn byte-level merges: one distributed pretoken-count pass (the
    * regex runs inside the scan via `regexp_extract_all` — codegen'd, no
    * UDF), truncated to the top `maxWords` pretokens, then the shared
    * driver merge loop over byte symbols. Same (rank, left, right,
    * merged, cnt) shape as [[train]]. */
  def trainBytes(
      docs: DataFrame,
      textCol: Column,
      numMerges: Int,
      maxWords: Int = 50000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pretokCounts: Array[(String, Long)] = graft.tables.Tables
      .rebalanceForCpu(docs) // regex-pretokenize-bound scan; no-op on well-split inputs
      .select(explode(regexp_extract_all(textCol, lit(PretokenPattern), lit(0))).as("pt"))
      .groupBy(col("pt"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pt"))
      .limit(maxWords)
      .as[(String, Long)]
      .collect()
    val words = pretokCounts.map { case (w, c) => (byteSymbolize(w), c) }
    learnMerges(words, numMerges).toDF("rank", "left", "right", "merged", "cnt")
  }

  /** Byte-level vocabulary: the full 256-byte alphabet first (ids 1-256 in
    * byte order — closed over ANY input, trained-on or not), then merged
    * symbols in rank order. Id 0 stays reserved for schema parity with the
    * char-level tier, but byte-level encoding can never emit it. */
  def vocabBytes(merges: DataFrame): DataFrame = {
    val spark = merges.sparkSession
    import spark.implicits._
    val base   = (0 until 256).map(b => byteToChar(b).toString)
    val merged = merges.orderBy(col("rank")).select(col("merged")).as[String].collect()
    (base ++ merged).zipWithIndex
      .map { case (s, i) => ((i + 1).toLong, s) }
      .toDF("vocab_id", "symbol")
  }

  /** Encode docs byte-level: pre-tokenize with [[PretokenPattern]], byte-
    * symbolize, greedy lowest-rank merges ([[applyMerges]] — the rule is
    * symbolization-agnostic), ids against [[vocabBytes]]. Same broadcast +
    * shuffle-free narrow-map shape as [[encode]]; per-partition pretoken
    * cache (Zipf again). (doc_id, n_pretok, n_tokens, ids) — no n_unk
    * column: byte coverage makes UNK structurally impossible. */
  def encodeBytes(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      merges: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rankOf: Map[(String, String), Int] = merges
      .select(col("left"), col("right"), col("rank"))
      .as[(String, String, Int)]
      .collect()
      .map { case (l, r, k) => ((l, r), k) }
      .toMap
    val idOf: Map[String, Long] = vocabBytes(merges)
      .select(col("symbol"), col("vocab_id")).as[(String, Long)].collect().toMap
    val bRanks = spark.sparkContext.broadcast(rankOf)
    val bIds   = spark.sparkContext.broadcast(idOf)
    graft.tables.Tables
      .rebalanceForCpu(docs) // per-byte merge loop; no-op on well-split inputs
      .select(idCol.cast("long").as("doc_id"), textCol.cast("string").as("txt"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ranks   = bRanks.value
        val ids     = bIds.value
        val pattern = java.util.regex.Pattern.compile(PretokenPattern)
        val cache   = mutable.HashMap.empty[String, Array[String]]
        def split(pt: String): Array[String] =
          cache.getOrElseUpdate(pt, applyMerges(byteSymbolize(pt), ranks))
        it.map { case (docId, txt) =>
          val text = if (txt == null) "" else txt
          val m    = pattern.matcher(text)
          val toks = mutable.ArrayBuffer.empty[String]
          var nPre = 0L
          while (m.find()) {
            nPre += 1
            toks ++= split(m.group())
          }
          // every symbol is in the closed byte vocab — .apply is safe
          (docId, nPre, toks.length.toLong, toks.map(ids).mkString(" "))
        }
      }
      .toDF("doc_id", "n_pretok", "n_tokens", "ids")
  }
}
