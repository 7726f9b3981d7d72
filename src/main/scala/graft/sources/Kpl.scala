package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** KPL record deaggregation (SURVEY.md §2.A A3/A5 extension) — the
  * Kinesis Producer Library packs many USER records into one KINESIS
  * record to beat the per-record service cap; every serious Kinesis
  * consumer (including the reference's feed: Arc events arrive over
  * Kinesis, README.md:2) must deaggregate before decoding. The public
  * wire format is:
  *
  *   magic 0xF3 0x89 0x9A 0xC2
  *   protobuf AggregatedRecord {
  *     repeated string partition_key_table   = 1;
  *     repeated string explicit_hash_key_table = 2;
  *     repeated Record records               = 3;  // nested message
  *   }
  *   Record { uint64 partition_key_index = 1;
  *            uint64 explicit_hash_key_index = 2;
  *            bytes  data = 3; }
  *   md5(protobuf body)                          // trailing 16 bytes
  *
  * Implemented as a pure protobuf WIRE walk (varint tags, length-
  * delimited fields — no protobuf library, same no-deps discipline as
  * the MP4/EBML walks) plus the MD5 integrity check via the JDK digest.
  * Non-aggregated payloads (no magic) pass through as a single record —
  * the standard consumer behavior — and corrupt aggregates (bad
  * varint, truncated field, checksum mismatch) dead-letter as
  * `decode_ok = false` rows, the A8 tolerance contract.
  *
  * Scale shape: a shuffle-free `mapPartitions` flatMap — each Kinesis
  * record explodes to its user records in place; nothing driver-sized.
  */
object Kpl {

  val Magic: Array[Byte] = Array(0xf3, 0x89, 0x9a, 0xc2).map(_.toByte)

  final case class UserRecord(
      agg_id: Long,
      decode_ok: Boolean,
      rec_idx: Long,     // position within the aggregate (0-based)
      partition_key: String,
      data: Array[Byte])

  // --- protobuf wire helpers --------------------------------------------

  private def varint(b: Array[Byte], off0: Int, end: Int): (Long, Int) = {
    var off = off0
    var shift = 0
    var v = 0L
    while (off < end) {
      val x = b(off) & 0xff
      v |= (x & 0x7fL) << shift
      off += 1
      if ((x & 0x80) == 0) return (v, off)
      shift += 7
      if (shift > 63) throw new IllegalArgumentException("varint overflow")
    }
    throw new IllegalArgumentException("truncated varint")
  }

  private def writeVarint(out: mutable.ArrayBuffer[Byte], v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
    out += (v & 0x7f).toByte
  }

  private def lenDelim(out: mutable.ArrayBuffer[Byte], field: Int, body: Array[Byte]): Unit = {
    writeVarint(out, (field << 3) | 2L)
    writeVarint(out, body.length.toLong)
    out ++= body
  }

  // --- writer (fixture/producer side) ------------------------------------

  /** Aggregate user records into one KPL-framed payload: (partitionKey,
    * data) pairs; keys dedupe into the key table as the real producer
    * does. */
  def aggregate(records: Seq[(String, Array[Byte])]): Array[Byte] = {
    val keys = records.map(_._1).distinct
    val keyIdx = keys.zipWithIndex.toMap
    val body = mutable.ArrayBuffer.empty[Byte]
    keys.foreach(k => lenDelim(body, 1, k.getBytes("UTF-8")))
    records.foreach { case (k, data) =>
      val rec = mutable.ArrayBuffer.empty[Byte]
      writeVarint(rec, (1 << 3) | 0L) // field 1, varint: partition_key_index
      writeVarint(rec, keyIdx(k).toLong)
      lenDelim(rec, 3, data)          // field 3, bytes: data
      lenDelim(body, 3, rec.toArray)
    }
    val bodyArr = body.toArray
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(bodyArr)
    Magic ++ bodyArr ++ md5
  }

  // --- parser -------------------------------------------------------------

  /** Deaggregate one payload into user records. A payload without the
    * magic is a single non-aggregated record (rec_idx 0, empty key). */
  def deaggregate(aggId: Long, payload: Array[Byte]): Seq[UserRecord] = {
    if (payload.length < 4 || !payload.take(4).sameElements(Magic))
      return Seq(UserRecord(aggId, decode_ok = true, 0L, "", payload))
    try {
      if (payload.length < 20) throw new IllegalArgumentException("too short")
      val body = java.util.Arrays.copyOfRange(payload, 4, payload.length - 16)
      val md5  = java.security.MessageDigest.getInstance("MD5").digest(body)
      if (!md5.sameElements(payload.takeRight(16)))
        throw new IllegalArgumentException("md5 mismatch")
      val keys = mutable.ArrayBuffer.empty[String]
      val recs = mutable.ArrayBuffer.empty[(Long, Array[Byte])] // (keyIdx, data)
      var off = 0
      while (off < body.length) {
        val (tag, o1) = varint(body, off, body.length)
        val field = (tag >>> 3).toInt
        val wire  = (tag & 7).toInt
        off = o1
        wire match {
          case 2 => // length-delimited
            val (len, o2) = varint(body, off, body.length)
            // validate in LONG arithmetic before truncating: a crafted
            // length >= 2^31 would truncate negative, slip past the bound
            // check, and `off = end` would re-parse the same tag forever —
            // an infinite loop instead of a dead-letter. len >= 0 also
            // guarantees end = o2 + len > off (varint consumed >= 1 byte),
            // so every iteration advances.
            if (len < 0L || o2 + len > body.length)
              throw new IllegalArgumentException("bad field length")
            val end = o2 + len.toInt
            field match {
              case 1 => keys += new String(body, o2, len.toInt, "UTF-8")
              case 3 => // nested Record
                var ro = o2
                var keyIdx = -1L
                var data: Array[Byte] = Array.empty
                while (ro < end) {
                  val (rtag, ro1) = varint(body, ro, end)
                  ro = ro1
                  ((rtag >>> 3).toInt, (rtag & 7).toInt) match {
                    case (1, 0) => val (v, ro2) = varint(body, ro, end); keyIdx = v; ro = ro2
                    case (2, 0) => val (_, ro2) = varint(body, ro, end); ro = ro2
                    case (_, 2) =>
                      val (l2, ro2) = varint(body, ro, end)
                      // same Long-arithmetic guard as the outer walk
                      if (l2 < 0L || ro2 + l2 > end)
                        throw new IllegalArgumentException("bad record field length")
                      val e2 = ro2 + l2.toInt
                      if ((rtag >>> 3).toInt == 3)
                        data = java.util.Arrays.copyOfRange(body, ro2, e2)
                      ro = e2
                    case _ => throw new IllegalArgumentException("unsupported wire type in record")
                  }
                }
                recs += ((keyIdx, data))
              case _ => () // unknown field: skip (forward compatibility)
            }
            off = end
          case 0 => val (_, o2) = varint(body, off, body.length); off = o2 // unknown varint field
          case _ => throw new IllegalArgumentException(s"unsupported wire type $wire")
        }
      }
      recs.zipWithIndex.map { case ((ki, data), i) =>
        val key =
          if (ki >= 0 && ki < keys.length) keys(ki.toInt)
          else throw new IllegalArgumentException(s"partition key index $ki out of range")
        UserRecord(aggId, decode_ok = true, i.toLong, key, data)
      }.toSeq
    } catch {
      case _: RuntimeException =>
        Seq(UserRecord(aggId, decode_ok = false, -1L, "", Array.empty))
    }
  }

  /** Spark surface: (id, payload) frame → exploded user records. One
    * narrow flatMap; corrupt aggregates dead-letter, never throw. */
  def deaggregateRecords(df: DataFrame): Dataset[UserRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("agg_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) => deaggregate(id, p) })
  }
}
