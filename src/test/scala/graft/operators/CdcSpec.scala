package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Laws for the CDC upsert apply (operators/Cdc.scala):
  *  - equivalence to an in-memory per-key fold of the changelog (the
  *    MERGE semantics ground truth) on randomized logs;
  *  - delete-of-absent-key is a no-op; untouched keys pass through
  *    byte-identical; latest-wins under reordered input partitions;
  *  - IVM consistency: the aggregate of the upserted snapshot equals the
  *    Ivm-maintained view fed the same changes as Z-set deltas — the
  *    "delta-maintained aggregate ≡ recompute over the merged table" law
  *    that ties c38_cdc_apply to c35_ivm_revenue.
  */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keys = Seq("k")

  private def snap(rows: (Long, String, Double)*): DataFrame =
    rows.toDF("k", "name", "bal")

  // changelog rows: (k, name, bal, seq, op)
  private def log(rows: (Long, String, Double, Long, String)*): DataFrame =
    rows.toDF("k", "name", "bal", "seq", "op")

  private def apply0(s: DataFrame, c: DataFrame): Map[Long, (String, Double)] =
    Cdc
      .upsert(s, c, keys, Seq(col("seq")), col("op"))
      .as[(Long, String, Double)]
      .collect()
      .map { case (k, n, b) => k -> (n, b) }
      .toMap

  /** In-memory MERGE ground truth: fold the log in seq order per key. */
  private def reference(
      s: Seq[(Long, String, Double)],
      c: Seq[(Long, String, Double, Long, String)]): Map[Long, (String, Double)] = {
    val byKey = c.groupBy(_._1)
    val touched = byKey.map { case (k, recs) =>
      val last = recs.maxBy(_._4)
      k -> (if (last._5 == "D") None else Some((last._2, last._3)))
    }
    val base = s.map(r => r._1 -> (r._2, r._3)).toMap
    (base.keySet ++ touched.keySet).flatMap { k =>
      touched.get(k) match {
        case Some(None)    => None                  // latest D → gone
        case Some(Some(v)) => Some(k -> v)          // latest I/U → payload
        case None          => base.get(k).map(k -> _)
      }
    }.toMap
  }

  test("upsert equals the per-key fold reference on a randomized changelog") {
    val rnd = new scala.util.Random(42)
    val s = (1L to 40L).map(k => (k, s"orig$k", k * 1.5))
    val c = (1L to 300L).map { seq =>
      val k  = rnd.nextInt(60).toLong + 1           // keys 1..60: half absent from snapshot
      val op = rnd.nextInt(4) match { case 0 => "D"; case 1 => "I"; case _ => "U" }
      (k, s"chg$seq", rnd.nextInt(1000) / 10.0, seq, op)
    }
    assert(apply0(snap(s: _*), log(c: _*)) === reference(s, c))
  }

  test("changelog missing a snapshot payload column is refused at plan time") {
    val s = snap((1L, "a", 1.0))
    val c = Seq((1L, 2L, "U")).toDF("k", "seq", "op") // no name/bal payload
    val e = intercept[IllegalArgumentException] {
      Cdc.upsert(s, c, keys, Seq(col("seq")), col("op"))
    }
    assert(e.getMessage.contains("name") && e.getMessage.contains("bal"))
  }

  test("delete of an absent key is a no-op; untouched keys pass through") {
    val s   = snap((1L, "a", 1.0), (2L, "b", 2.0))
    val c   = log((9L, "x", 0.0, 1L, "D"))
    val out = apply0(s, c)
    assert(out === Map(1L -> ("a", 1.0), 2L -> ("b", 2.0)))
  }

  test("latest writer wins regardless of input partitioning") {
    val s = snap((1L, "a", 1.0))
    val c = log(
      (1L, "v3", 30.0, 3L, "U"),
      (1L, "v1", 10.0, 1L, "U"),
      (1L, "v2", 20.0, 2L, "U"))
    assert(apply0(s, c.repartition(7)) === Map(1L -> ("v3", 30.0)))
    // ...and a trailing delete erases however many earlier updates
    val c2 = c.unionByName(log((1L, "dead", 0.0, 4L, "D")))
    assert(apply0(s, c2.repartition(5)) === Map.empty)
  }

  test("deletedKeys reports exactly the snapshot keys whose latest record is D") {
    val s = snap((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
    val c = log(
      (1L, "x", 0.0, 1L, "D"),  // latest D, in snapshot → reported
      (2L, "y", 9.0, 1L, "D"),
      (2L, "z", 8.0, 2L, "U"),  // D superseded by U → not reported
      (9L, "w", 0.0, 1L, "D"))  // D on absent key → not reported
    val got = Cdc
      .deletedKeys(s, c, keys, Seq(col("seq")), col("op"))
      .as[Long].collect().toSet
    assert(got === Set(1L))
  }

  test("incremental apply: folding the changelog in N batches equals one-shot apply") {
    // the lakehouse daily-merge law: MERGE(MERGE(snap, day1), day2) ==
    // MERGE(snap, day1 ∪ day2) — holds because last-writer-wins only
    // depends on each key's latest record, whichever batch carried it
    val rnd = new scala.util.Random(7)
    val s = (1L to 30L).map(k => (k, s"base$k", k * 2.0))
    val c = (1L to 200L).map { seq =>
      val k  = rnd.nextInt(45).toLong + 1
      val op = if (rnd.nextInt(5) == 0) "D" else "U"
      (k, s"c$seq", rnd.nextInt(500) / 10.0, seq, op)
    }
    val oneShot = apply0(snap(s: _*), log(c: _*))
    val batched = c.grouped(50).foldLeft(snap(s: _*)) { (acc, batch) =>
      Cdc.upsert(acc, log(batch: _*), keys, Seq(col("seq")), col("op")).localCheckpoint()
    }
    val gotBatched = batched.as[(Long, String, Double)].collect()
      .map { case (k, n, b) => k -> (n, b) }.toMap
    assert(gotBatched === oneShot)
  }

  test("IVM consistency: delta-maintained sum equals recompute over the upserted snapshot") {
    val s = snap((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    val c = log(
      (2L, "b2", 25.0, 1L, "U"),   // update: retract 20, insert 25
      (3L, "c!", 0.0, 2L, "D"),    // delete: retract 30
      (4L, "d", 40.0, 3L, "I"),    // insert new key
      (4L, "d2", 44.0, 4L, "U"))   // then update it again
    val upserted = Cdc.upsert(s, c, keys, Seq(col("seq")), col("op"))
    val recompute = upserted
      .agg(sum(col("bal").cast("decimal(28,4)")).as("t"), count(lit(1)).as("n"))
      .as[(java.math.BigDecimal, Long)].head()

    // Z-set derivation of the SAME changes: +1 per initial snapshot row,
    // then per touched key retract the prior surviving value (snapshot or
    // superseded change) and insert the new one. Deriving it per change
    // record (not per final key) exercises Ivm's associativity too.
    val g = lit("all")
    val base = Ivm.aggDelta(s.withColumn("g", g), lit(1L), col("bal"), Seq("g"))
    val ordered = c.as[(Long, String, Double, Long, String)].collect().sortBy(_._4)
    var prior = s.as[(Long, String, Double)].collect().map(r => r._1 -> r._3).toMap
    val zrows = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    ordered.foreach { case (k, _, bal, _, op) =>
      prior.get(k).foreach(v => zrows += ((v, -1L)))
      if (op == "D") prior -= k
      else { zrows += ((bal, 1L)); prior += (k -> bal) }
    }
    val delta = Ivm.aggDelta(
      zrows.toSeq.toDF("bal", "w").withColumn("g", g), col("w"), col("bal"), Seq("g"))
    val st = Ivm.applyDelta(base, delta, Seq("g"))
      .as[(String, Long, java.math.BigDecimal)].head()
    assert(st._2 === recompute._2, "IVM count diverged from recompute")
    assert(st._3.compareTo(recompute._1) === 0, "IVM sum diverged from recompute")
  }
}
