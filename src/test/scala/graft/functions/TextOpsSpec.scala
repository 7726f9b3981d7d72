package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokens lowercases and drops empties") {
    val out = Seq("Hello  World  FOO").toDF("t")
      .select(TextOps.tokens(col("t")).as("toks"))
      .collect().head.getSeq[String](0)
    assert(out === Seq("hello", "world", "foo"))
  }

  test("shingles: k-grams, and whole-doc fallback for short docs") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(TextOps.shingles(TextOps.tokens(col("t")), 3).as("sh"))
      .collect()
    assert(df(0).getSeq[String](0) === Seq("a b c", "b c d"))
    assert(df(1).getSeq[String](0) === Seq("a b"))
  }

  test("JVM hash twins are bit-identical to the Column forms on fixture docs") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
    // xxhash64 / shingle-hash / token-hash twins, all on the same rows
    val viaSql = docs.select(
      col("doc_id"),
      xxhash64(col("text")).as("h"),
      transform(TextOps.shingles(TextOps.tokens(col("text")), 3), s => xxhash64(s)).as("shh"),
      TextOps.tokenHashes(TextOps.tokenSet(col("text"))).as("th")
    ).as[(Long, Long, Array[Long], Array[Long])].collect()
    val byId = docs.as[(Long, String)].collect().toMap
    viaSql.foreach { case (id, h, shh, th) =>
      val text = byId(id)
      assert(TextOps.xxhash64Jvm(text) === h, s"xxhash64 diverged on doc $id")
      assert(TextOps.shingleHashesJvm(text, 3).toSeq === shh.toSeq, s"shingle hashes diverged on doc $id")
      assert(TextOps.tokenHashesJvm(text).toSeq === th.toSeq, s"token hashes diverged on doc $id")
    }
    // whole-doc-shingle fallback for short docs
    assert(TextOps.shingleHashesJvm("a b", 3).toSeq === Seq(TextOps.xxhash64Jvm("a b")))
  }

  test("minhash signature has numHashes entries and identical docs agree") {
    val df = Seq("the quick brown fox jumps", "the quick brown fox jumps", "totally different text here now").toDF("t")
      .select(TextOps.minHashSignature(TextOps.shingles(TextOps.tokens(col("t")), 2), 16).as("sig"))
      .collect()
    assert(df(0).getSeq[Long](0).length === 16)
    assert(df(0).getSeq[Long](0) === df(1).getSeq[Long](0))
    assert(df(0).getSeq[Long](0) !== df(2).getSeq[Long](0))
  }

  test("minhash estimates Jaccard within tolerance (property over overlap levels)") {
    // docs sharing m of 20 shingle-tokens: estimated sim ≈ m/ (40-m... ) —
    // construct pairs with known Jaccard via disjoint vocabularies.
    val base   = (0 until 30).map(i => s"tok$i")
    val numH   = 128
    val cases = Seq(30, 20, 10) // shared prefix size vs 30-total each side
    cases.foreach { shared =>
      val a = base.take(30).mkString(" ")
      val b = (base.take(shared) ++ (0 until (30 - shared)).map(i => s"other$i")).mkString(" ")
      val expected = shared.toDouble / (60 - shared).toDouble
      val sigs = Seq(a, b).toDF("t")
        .select(TextOps.minHashSignature(array_distinct(TextOps.tokens(col("t"))), numH).as("sig"))
        .collect().map(_.getSeq[Long](0))
      val est = sigs(0).zip(sigs(1)).count { case (x, y) => x == y }.toDouble / numH
      assert(math.abs(est - expected) < 0.15, s"shared=$shared est=$est expected=$expected")
    }
  }

  test("jaccard column matches set arithmetic") {
    val out = Seq(("a b c", "b c d")).toDF("x", "y")
      .select(TextOps.jaccard(
        array_distinct(TextOps.tokens(col("x"))),
        array_distinct(TextOps.tokens(col("y")))).as("j"))
      .collect().head.getDouble(0)
    assert(math.abs(out - 2.0 / 4.0) < 1e-12)
  }

  test("simhash: identical docs → distance 0; near docs closer than far docs") {
    val docs = Seq(
      "spark engine filter join window aggregate shuffle partition",
      "spark engine filter join window aggregate shuffle partition",
      "spark engine filter join window aggregate shuffle broadcast",
      "completely unrelated corpus about cooking pasta tomatoes basil"
    ).toDF("t")
      .select(TextOps.tokenHashes(TextOps.tokenSet(col("t"))).as("hs"))
      .select(TextOps.simHashOfHashes("hs").as("sh"))
      .collect().map(_.getLong(0))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(docs(0), docs(1)) === 0)
    assert(ham(docs(0), docs(2)) < ham(docs(0), docs(3)))
  }

  test("simHash64 (JVM hot path) is bit-identical to the SQL expression") {
    val docs = Seq(
      "spark engine filter join window aggregate",
      "completely unrelated corpus about cooking pasta"
    ).toDF("t").select(TextOps.tokenHashes(TextOps.tokenSet(col("t"))).as("hs"))
    val viaExpr  = docs.select(TextOps.simHashOfHashes("hs").as("sh")).collect().map(_.getLong(0))
    val viaScala = docs.collect().map(r => TextOps.simHash64(r.getSeq[Long](0).toArray))
    assert(viaExpr.toSeq === viaScala.toSeq)
  }

  test("langId picks the profile language; und when nothing matches") {
    val out = Seq(
      "the cat sat on the mat and it is a good day for the dog",
      "le chat est sur la table et il est un bon jour pour les chiens",
      "el gato es un animal y la casa es grande por los dias",
      "zzz qqq www xyz"
    ).toDF("t").select(TextOps.langId(TextOps.tokens(col("t"))).as("l")).collect().map(_.getString(0))
    assert(out(0) === "en")
    assert(out(1) === "fr")
    assert(out(2) === "es")
    assert(out(3) === "und")
  }

  test("fingerprint is deterministic and order-sensitive") {
    val fps = Seq("a b c", "a b c", "c b a").toDF("t")
      .select(TextOps.fingerprint(TextOps.tokens(col("t"))).as("fp"))
      .collect().map(_.getLong(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
    assert(fps.forall(f => f >= 0 && f < 1000000007L))
  }

  test("degenerate inputs: empty/whitespace/unicode text never throw") {
    val out = Seq("", "   ", "é ü 你好", "x " * 5000)
      .toDF("t")
      .select(
        TextOps.tokens(col("t")).as("toks"),
        TextOps.fingerprint(TextOps.tokens(col("t"))).as("fp"),
        TextOps.langId(TextOps.tokens(col("t"))).as("lang"),
        TextOps.stopwordRatio(TextOps.tokens(col("t"))).as("ratio")
      )
      .collect()
    assert(out(0).getSeq[String](0).isEmpty)
    assert(out(1).getSeq[String](0).isEmpty)
    assert(out(0).getLong(1) === 0L)        // empty fold → initial acc
    assert(out(0).getString(2) === "und")
    assert(out(0).isNullAt(3))              // empty doc → null ratio (fail-closed in gates)
    assert(out(2).getSeq[String](0) === Seq("é", "ü", "你好"))
    assert(out(3).getSeq[String](0).length === 5000)
  }

  test("approxBpeTokens: ~chars/4 ignoring whitespace") {
    val out = Seq("abcd efgh").toDF("t")
      .select(TextOps.approxBpeTokens(col("t")).as("n")).collect().head.getLong(0)
    assert(out === 2L)
  }

  test("qualityScore: exact logistic over the feature·weight dot product, weights are data") {
    val rows = Seq(
      (1L, Array(0.5, 0.2, 0.9), Array(1.0, -2.0, 0.5), -0.3),
      (2L, Array(0.0, 0.0, 0.0), Array(1.0, -2.0, 0.5), -0.3)
    ).toDF("id", "f", "w", "bias")
    val got = rows
      .select(col("id"), TextOps.qualityScore(col("f"), col("w"), col("bias")).as("q"))
      .as[(Long, Double)].collect().toMap
    def sigma(z: Double) = 1.0 / (1.0 + math.exp(-z))
    assert(math.abs(got(1L) - sigma(-0.3 + 0.5 - 0.4 + 0.45)) < 1e-12)
    assert(math.abs(got(2L) - sigma(-0.3)) < 1e-12)
    // Swapping the weight row (the broadcast model dim) moves the score —
    // a retrained model is a data change, not a plan change.
    val swapped = rows
      .withColumn("w", array(lit(0.0), lit(0.0), lit(0.0)))
      .select(TextOps.qualityScore(col("f"), col("w"), col("bias")).as("q"))
      .as[Double].collect()
    assert(swapped.forall(q => math.abs(q - sigma(-0.3)) < 1e-12))
  }

  test("redactPii replaces emails and phones with typed tags, leaves clean text alone") {
    val out = Seq(
      "reach me at jane.doe+x@mail-server.io today",
      "call 555-0134 or 800-1234 now",
      "mixed: a@b.co and 123-4567",
      "nothing to redact here"
    ).toDF("t").select(TextOps.redactPii(col("t")).as("c")).as[String].collect()
    assert(out(0) === "reach me at [EMAIL] today")
    assert(out(1) === "call [PHONE] or [PHONE] now")
    assert(out(2) === "mixed: [EMAIL] and [PHONE]")
    assert(out(3) === "nothing to redact here")
  }
}
