package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cand(rows: (Long, Double)*) = rows.toSeq.toDF("id", "rel")
  private def sims(rows: (Long, Long, Double)*) = rows.toSeq.toDF("id_a", "id_b", "sim")

  test("first pick is the relevance argmax; every later pick maximizes the MMR objective") {
    // 1 and 2 are near-duplicates (sim .95); 3 is distinct but less relevant.
    val c = cand((1L, 1.0), (2L, 0.9), (3L, 0.5))
    val s = sims((1L, 2L, 0.95), (1L, 3L, 0.1), (2L, 3L, 0.1))
    val got = Mmr.rerank(c, s, lambda = 0.5, select = 3)
      .select("sel_rank", "doc_id").as[(Long, Long)].collect().sortBy(_._1)
    // pick1: id 1 (top rel). pick2: 2 scores .5*.9-.5*.95 = -0.025;
    // 3 scores .5*.5-.5*.1 = 0.2 → 3 wins despite lower relevance.
    assert(got.map(_._2).toSeq === Seq(1L, 3L, 2L))
  }

  test("lambda = 1 reduces to pure relevance order") {
    val c = cand((10L, 0.2), (11L, 0.9), (12L, 0.5))
    val s = sims((10L, 11L, 0.99), (10L, 12L, 0.99), (11L, 12L, 0.99))
    val got = Mmr.rerank(c, s, lambda = 1.0, select = 3)
      .orderBy("sel_rank").select("doc_id").as[Long].collect()
    assert(got.toSeq === Seq(11L, 12L, 10L))
  }

  test("greedy trace matches an independent in-memory replay on a random instance") {
    val rnd  = new scala.util.Random(7)
    val n    = 15
    val rels = (1L to n.toLong).map(i => i -> rnd.nextDouble()).toVector
    val ss = (for { a <- 1 to n; b <- a + 1 to n } yield
      (a.toLong, b.toLong, rnd.nextDouble())).toVector
    val lambda = 0.7
    val got = Mmr.rerank(cand(rels: _*), sims(ss: _*), lambda, select = 8)
      .orderBy("sel_rank").select("doc_id", "mmr").as[(Long, Double)].collect()

    // Independent replay.
    val simM = ss.flatMap { case (a, b, s) => Seq((a, b) -> s, (b, a) -> s) }.toMap
    var remaining = rels
    var picked    = Vector.empty[(Long, Double)]
    while (picked.length < 8) {
      val best = remaining.map { case (id, r) =>
        val ms = if (picked.isEmpty) 0.0 else picked.map(p => simM((id, p._1))).max
        (id, lambda * r - (1 - lambda) * ms)
      }.maxBy { case (id, sc) => (sc, -id) }
      picked = picked :+ best
      remaining = remaining.filterNot(_._1 == best._1)
    }
    assert(got.map(_._1).toSeq === picked.map(_._1))
    got.zip(picked).foreach { case ((_, m), (_, sc)) =>
      assert(math.abs(m - sc) < 1e-6)
    }
  }

  test("refuses unbounded candidate frames") {
    val big = spark.range(2000).select(col("id"), lit(1.0).as("rel"))
    val e = intercept[IllegalArgumentException] {
      Mmr.rerank(big, sims(), lambda = 0.5, select = 5)
    }
    assert(e.getMessage.contains("maxCandidates"))
  }

  test("select beyond candidate count returns all candidates, dense ranks") {
    val got = Mmr.rerank(cand((1L, 0.3), (2L, 0.8)), sims((1L, 2L, 0.4)), 0.5, select = 10)
      .orderBy("sel_rank").select("sel_rank", "doc_id").as[(Long, Long)].collect()
    assert(got.map(_._1).toSeq === Seq(1L, 2L))
    assert(got.map(_._2).toSet === Set(1L, 2L))
  }
}
