package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = graft.tables.Tables.documents(spark, TestSpark.sf0001)
  private val p = HeavyHitters.Params()

  private lazy val result =
    HeavyHitters.topK(docs, col("text"), p).as[(String, Long, Long, Long)].collect()

  private lazy val exactCounts = HeavyHitters
    .tokenStream(docs, col("text"))
    .groupBy("tok")
    .agg(count(lit(1)).as("cnt"))
    .as[(String, Long)]
    .collect()

  test("CMS never underestimates and stays within eps·N (fixed seed, deterministic)") {
    val total = exactCounts.map(_._2).sum
    result.foreach { case (tok, est, exact, over) =>
      assert(over === est - exact)
      assert(est >= exact, s"$tok underestimated: $est < $exact")
      assert(est <= exact + math.ceil(p.eps * total).toLong, s"$tok over bound: $est vs $exact")
    }
  }

  test("reported top-k covers the exact top-k (small-eps regime)") {
    val trueTop = exactCounts.sortBy(t => (-t._2, t._1)).take(p.k).map(_._1).toSet
    val got = result.map(_._1).toSet
    val recall = trueTop.intersect(got).size.toDouble / p.k
    assert(recall >= 0.9, s"recall $recall; missing ${trueTop.diff(got)}")
  }

  test("Misra-Gries candidates are a superset of every token with count > N/(cap+1)") {
    val tokens = HeavyHitters.tokenStream(docs, col("text"))
    val cap = 16 // tight capacity so the guarantee is actually exercised
    val cand = HeavyHitters.candidates(tokens, cap).as[String].collect().toSet
    val n = exactCounts.map(_._2).sum
    val mustSurvive = exactCounts.filter(_._2 > n / (cap + 1)).map(_._1)
    val missed = mustSurvive.filterNot(cand)
    assert(missed.isEmpty, s"MG guarantee violated for: ${missed.mkString(",")}")
  }

  test("MG survives adversarial partitioning of a crafted heavy hitter") {
    // "hot" is >1/3 of the stream but scattered across partitions;
    // cap=2 forces constant eviction pressure.
    val rng = new scala.util.Random(42)
    val rows = rng.shuffle(Seq.fill(500)("hot") ++ (1 to 800).map(i => s"cold$i"))
    val tokens = spark.sparkContext.parallelize(rows, 8).toDF("tok")
    val cand = HeavyHitters.candidates(tokens, 2).as[String].collect().toSet
    assert(cand.contains("hot"))
  }
}
