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
}
