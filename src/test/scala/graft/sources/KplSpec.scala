package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** KPL deaggregation laws: writer→parser roundtrip (order, keys, bytes),
  * key-table dedup, pass-through of non-aggregated payloads, checksum
  * and structural dead-lettering, unknown-field tolerance. */
class KplSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rt(records: Seq[(String, Array[Byte])]) =
    Kpl.deaggregate(1L, Kpl.aggregate(records))

  test("aggregate → deaggregate roundtrips records in order with their keys and bytes") {
    val recs = Seq(
      ("user-1", "hello".getBytes("UTF-8")),
      ("user-2", Array[Byte](0, 1, 2, 3, -1)),
      ("user-1", "world".getBytes("UTF-8")), // key table dedupes, record keeps key
      ("user-3", Array.empty[Byte]))
    val out = rt(recs)
    assert(out.forall(_.decode_ok))
    assert(out.map(_.rec_idx) === Seq(0L, 1L, 2L, 3L))
    assert(out.map(_.partition_key) === recs.map(_._1))
    out.zip(recs).foreach { case (u, (_, d)) => assert(u.data.sameElements(d)) }
  }

  test("random payloads roundtrip (sizes, binary content, many keys)") {
    val rnd = new scala.util.Random(5150)
    (0 until 10).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      val recs = Seq.fill(n)((s"pk${rnd.nextInt(8)}", {
        val b = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(b); b
      }))
      val out = rt(recs)
      assert(out.length === n && out.forall(_.decode_ok))
      out.zip(recs).foreach { case (u, (k, d)) =>
        assert(u.partition_key === k && u.data.sameElements(d))
      }
    }
  }

  test("large payloads force multi-byte length varints and still roundtrip") {
    val big = new Array[Byte](70000) // > 2^16: 3-byte varint lengths
    new scala.util.Random(1).nextBytes(big)
    val out = rt(Seq(("k", big), ("k2", "tail".getBytes("UTF-8"))))
    assert(out.length === 2 && out.forall(_.decode_ok))
    assert(out.head.data.sameElements(big))
    assert(new String(out(1).data, "UTF-8") === "tail")
  }

  test("non-aggregated payload passes through as one record") {
    val out = Kpl.deaggregate(7L, "plain json line".getBytes("UTF-8"))
    assert(out === Seq(Kpl.UserRecord(7L, true, 0L, "", out.head.data)))
    assert(new String(out.head.data, "UTF-8") === "plain json line")
  }

  test("corrupt aggregates dead-letter: flipped checksum byte, truncation, bad key index") {
    val good = Kpl.aggregate(Seq(("k", "data".getBytes("UTF-8"))))
    val flipped = good.clone(); flipped(flipped.length - 1) = (flipped.last ^ 0x5a).toByte
    assert(Kpl.deaggregate(1L, flipped).forall(!_.decode_ok), "md5 mismatch accepted")
    assert(Kpl.deaggregate(1L, good.take(10)).forall(!_.decode_ok), "truncation accepted")
    // magic + valid md5 over a body with an out-of-range key index
    val body = {
      val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
      // records field (3) with one record pointing at key index 9 (no table)
      val rec = scala.collection.mutable.ArrayBuffer.empty[Byte]
      rec += ((1 << 3) | 0).toByte; rec += 9.toByte
      b += ((3 << 3) | 2).toByte; b += rec.length.toByte; b ++= rec
      b.toArray
    }
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(body)
    assert(Kpl.deaggregate(1L, Kpl.Magic ++ body ++ md5).forall(!_.decode_ok),
      "dangling key index accepted")
  }

  test("md5-consistent oversized length varint dead-letters instead of looping") {
    // a length >= 2^31 truncates negative in Int; before the Long-arithmetic
    // guard the walk's `off = end` then re-parsed the same tag forever —
    // this test HANGS (not fails) on a regression, with a valid checksum so
    // the md5 gate cannot save it
    def withLen(len: Seq[Byte]): Array[Byte] = {
      val body = (((1 << 3) | 2).toByte +: len).toArray
      val md5  = java.security.MessageDigest.getInstance("MD5").digest(body)
      Kpl.Magic ++ body ++ md5
    }
    val twoPow31 = Seq(0x80, 0x80, 0x80, 0x80, 0x08).map(_.toByte) // varint 2^31
    assert(Kpl.deaggregate(1L, withLen(twoPow31)).forall(!_.decode_ok),
      "negative-truncating length accepted")
    // nested record field with the same oversized length
    val rec  = (((3 << 3) | 2).toByte +: Seq(0x80, 0x80, 0x80, 0x80, 0x08).map(_.toByte)).toArray
    val body = Array(((3 << 3) | 2).toByte, rec.length.toByte) ++ rec
    val md5  = java.security.MessageDigest.getInstance("MD5").digest(body)
    assert(Kpl.deaggregate(1L, Kpl.Magic ++ body ++ md5).forall(!_.decode_ok),
      "negative-truncating nested length accepted")
  }

  test("fuzz: arbitrary random bytes (with and without magic) terminate and never throw") {
    val rnd = new scala.util.Random(1234)
    (1 to 2000).foreach { i =>
      val len = rnd.nextInt(200)
      val b   = new Array[Byte](len); rnd.nextBytes(b)
      // raw garbage: must come back as pass-through or dead-letter
      assert(Kpl.deaggregate(i.toLong, b).nonEmpty)
      // magic-prefixed garbage: forced down the wire walk — must
      // dead-letter (or parse, for the rare valid accident), never hang
      val withMagic = Kpl.Magic ++ b
      assert(Kpl.deaggregate(i.toLong, withMagic).nonEmpty)
      // md5-consistent garbage: the checksum gate is bypassed, so the
      // walk itself must survive arbitrary tag/length/nesting bytes —
      // termination + no-throw is the property (a body that happens to
      // parse clean with zero records legitimately yields zero rows)
      val md5 = java.security.MessageDigest.getInstance("MD5").digest(b)
      Kpl.deaggregate(i.toLong, Kpl.Magic ++ b ++ md5)
    }
  }

  test("Spark surface explodes aggregates narrowly and dead-letters per record") {
    val p1 = Kpl.aggregate(Seq(("a", "x".getBytes), ("b", "y".getBytes)))
    val p2 = "raw".getBytes("UTF-8")
    val p3 = { val c = p1.clone(); c(6) = (c(6) ^ 0x7f).toByte; c } // corrupt body
    val out = Kpl
      .deaggregateRecords(Seq((1L, p1), (2L, p2), (3L, p3)).toDF("agg_id", "payload"))
      .collect()
    assert(out.count(r => r.agg_id == 1L && r.decode_ok) === 2)
    assert(out.exists(r => r.agg_id == 2L && r.decode_ok && new String(r.data) == "raw"))
    assert(out.filter(_.agg_id == 3L).forall(!_.decode_ok))
  }
}
