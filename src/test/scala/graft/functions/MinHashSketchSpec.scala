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
