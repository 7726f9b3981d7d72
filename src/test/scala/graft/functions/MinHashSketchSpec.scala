package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MinHashSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val numHashes = 64

  private def sigs(texts: Seq[String]) = texts.toDF("text")
    .select(TextOps.minHashSignature(
      array_distinct(TextOps.tokens(col("text"))), numHashes).as("sig"))

  test("union sketch via the Aggregator equals the sketch of the concatenation") {
    val docs = Seq("alpha beta gamma", "gamma delta epsilon", "zeta eta theta")
    val agg = new MinHashSketchAggregator(numHashes).toColumn
    val unionSig: Array[Long] = sigs(docs).as[Array[Long]].select(agg).collect().head
    val directSig = sigs(Seq(docs.mkString(" "))).as[Array[Long]].collect().head
    assert(unionSig.toSeq === directSig.toSeq)
  }

  test("partial aggregation: per-group sketches over a grouped Dataset") {
    val df = Seq(
      ("a", "spark query engine"), ("a", "query plan optimizer"),
      ("b", "cooking pasta tomatoes"), ("b", "basil olive oil")
    ).toDF("grp", "text")
      .select(col("grp"), TextOps.minHashSignature(
        array_distinct(TextOps.tokens(col("text"))), numHashes).as("sig"))
      .as[(String, Array[Long])]
    val agg = new MinHashSketchAggregator(numHashes).toColumn
    val perGroup = df.groupByKey(_._1).mapValues(_._2).agg(agg).collect().toMap
    assert(perGroup.keySet === Set("a", "b"))
    // estimated Jaccard between disjoint-vocabulary groups ≈ 0
    val est = MinHashSketch.estimateJaccard(perGroup("a"), perGroup("b"))
    assert(est < 0.15, s"disjoint groups estimated at $est")
    // group vs itself = 1
    assert(MinHashSketch.estimateJaccard(perGroup("a"), perGroup("a")) === 1.0)
  }

  test("estimateJaccardCol and the native expression are bit-identical to the JVM estimator") {
    val pairs = Seq(
      ("alpha beta gamma delta", "alpha beta gamma epsilon"),
      ("w1 w2 w3", "x1 x2 x3"),
      ("same same tokens here", "same same tokens here")
    ).toDF("ta", "tb")
      .select(
        TextOps.minHashSignature(array_distinct(TextOps.tokens(col("ta"))), numHashes).as("sa"),
        TextOps.minHashSignature(array_distinct(TextOps.tokens(col("tb"))), numHashes).as("sb"))
    val viaCol = pairs
      .select(MinHashSketch.estimateJaccardCol(col("sa"), col("sb"), numHashes).as("e"))
      .as[Double].collect()
    val viaNative = pairs
      .select(MinHashSketch.estimateJaccardNative(spark, col("sa"), col("sb")).as("e"))
      .as[Double].collect()
    val viaJvm = pairs.as[(Array[Long], Array[Long])].collect()
      .map { case (a, b) => MinHashSketch.estimateJaccard(a, b) }
    assert(viaCol.toSeq === viaJvm.toSeq)
    assert(viaNative.toSeq === viaJvm.toSeq)
  }

  test("native sig agreement: null array -> null, length mismatch -> null, null slot -> disagreement") {
    graft.catalyst.GraftExtensions.register(spark)
    val df = Seq(
      (Some(Seq(1L, 2L, 3L, 4L)), Some(Seq(1L, 9L, 3L, 4L))), // 3/4 agree
      (None, Some(Seq(1L, 2L))),                              // null array
      (Some(Seq(1L, 2L)), Some(Seq(1L, 2L, 3L)))              // length mismatch
    ).toDF("a", "b")
    val out = df.selectExpr("graft_sig_agreement(a, b) AS e").as[Option[Double]].collect()
    assert(out(0) === Some(0.75))
    assert(out(1) === None)
    assert(out(2) === None)
  }

  test("d2_source_overlap estimate tracks exact shingle Jaccard between sources") {
    // Exact union-shingle-set Jaccard between the two fixture sources vs
    // the registered query's union-sketch estimate: |est − exact| bounded
    // by the 32-hash sketch ε. Deterministic (fixed hash family).
    val sf  = TestSpark.sf0001
    val est = graft.SparkEntry.queries("d2_source_overlap")(spark, sf)
      .select("src_a", "src_b", "est_overlap")
      .as[(String, String, Double)].collect()
      .map { case (a, b, e) => (a, b) -> e }.toMap
    assert(est.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val shingled = docs
      .select(col("source"), col("text").cast("string").as("t"))
      .as[(String, String)]
      .filter(_._2 != null)
      .flatMap { case (src, t) =>
        Option(TextOps.distinctShingleHashesJvm(t, 3)).toSeq.flatMap(_.map(src -> _))
      }
      .toDF("source", "h").distinct()
    val exact = {
      val bySrc = shingled.as[(String, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      for { ((a, b), _) <- est } yield {
        val (sa, sb) = (bySrc(a), bySrc(b))
        (a, b) -> sa.intersect(sb).size.toDouble / sa.union(sb).size
      }
    }
    est.foreach { case (k, e) =>
      assert(math.abs(e - exact(k)) < 0.2, s"$k: est=$e exact=${exact(k)}")
    }
  }

  test("OPH: densified signature has no empty slots; empty input stays all-MaxValue") {
    val few = TextOps.ophSignature64(Array(42L, 43L, 44L), 64) // 3 shingles, 64 bins
    assert(!few.contains(Long.MaxValue), "densification left an empty slot")
    val empty = TextOps.ophSignature64(Array.empty[Long], 64)
    assert(empty.forall(_ == Long.MaxValue), "empty doc must stay all-MaxValue")
  }

  test("OPH: signature is independent of shingle order (partitioning independence)") {
    val hashes = Array.tabulate(200)(i => TextOps.splitmix64(i.toLong * 31L + 7L))
    val a = TextOps.ophSignature64(hashes, 64)
    val b = TextOps.ophSignature64(scala.util.Random.shuffle(hashes.toSeq).toArray, 64)
    assert(a.toSeq === b.toSeq)
  }

  test("OPH: identical shingle sets agree on every slot; estimator tracks true Jaccard") {
    def setOf(n: Int, salt: Long) =
      Array.tabulate(n)(i => TextOps.splitmix64(i.toLong * 1315423911L + salt))
    val sa = setOf(300, 1L)
    assert(MinHashSketch.estimateJaccard(
      TextOps.ophSignature64(sa, 128), TextOps.ophSignature64(sa, 128)) === 1.0)
    // Two sets sharing half their elements: J = 150/450 = 1/3.
    val shared  = sa.take(150)
    val sb      = shared ++ setOf(300, 2L).take(150).map(h => TextOps.splitmix64(h)) // 150 distinct
    val est = MinHashSketch.estimateJaccard(
      TextOps.ophSignature64(sa, 256), TextOps.ophSignature64(sb, 256))
    val exact = {
      val (xa, xb) = (sa.toSet, sb.toSet)
      xa.intersect(xb).size.toDouble / xa.union(xb).size
    }
    assert(math.abs(est - exact) < 0.12, s"est=$est exact=$exact")
  }

  test("OPH: banded pipeline recovers planted near-identical pairs") {
    // 10 planted pairs of one-token-mutated docs (shingle Jaccard ~0.85)
    // + 20 unrelated docs; OPH-signature LSH at 16 bands x 4 rows
    // (detection prob > 1 - 1e-5 per pair at J=0.85) must recover every
    // planted pair after exact verification. Deterministic hash family —
    // pass/fail is stable, not a coin flip.
    val docs = (0 until 10).flatMap { p =>
      val base = (0 until 40).map(i => s"p${p}_w$i")
      val twin = base.updated(5, "mut1")
      Seq((p.toLong * 2, base.mkString(" ")), (p.toLong * 2 + 1, twin.mkString(" ")))
    } ++ (0 until 20).map(i => (100L + i, (0 until 40).map(j => s"uniq${i}_$j").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val pairs = graft.operators.Dedup
      .nearDuplicatePairs(df, col("doc_id"), col("text"),
        graft.operators.Dedup.MinHashParams(numHashes = 64, numBands = 16,
          jaccardThreshold = 0.5, useOph = true))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    (0 until 10).foreach { p =>
      assert(pairs.contains((p.toLong * 2, p.toLong * 2 + 1)),
        s"planted pair $p missed by OPH banding; found=$pairs")
    }
  }

  test("sketch estimate tracks true Jaccard of group token unions") {
    // groups sharing half their vocabulary
    val g1 = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val g2 = "w1 w2 w3 w4 w5 x6 x7 x8 x9 x10" // true Jaccard = 5/15 = 0.333
    val df = Seq(("a", g1), ("b", g2)).toDF("grp", "text")
      .select(col("grp"), TextOps.minHashSignature(
        array_distinct(TextOps.tokens(col("text"))), 256).as("sig"))
      .as[(String, Array[Long])]
    val agg = new MinHashSketchAggregator(256).toColumn
    val m = df.groupByKey(_._1).mapValues(_._2).agg(agg).collect().toMap
    val est = MinHashSketch.estimateJaccard(m("a"), m("b"))
    assert(math.abs(est - 1.0 / 3.0) < 0.12, s"est=$est")
  }
}
