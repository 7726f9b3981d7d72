package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.streaming.{
  GroupState,
  GroupStateTimeout,
  OutputMode,
  StatefulProcessor,
  TimeMode,
  TimerValues,
  TTLConfig,
  ValueState
}

/** Streaming operator surface (SURVEY.md §2.B B1–B8), built on Structured
  * Streaming. Each transform is written against a plain DataFrame so the
  * identical logical plan runs in batch (oracle-checked batch twins in
  * EventQueries) and in streaming (MemoryStream tests in StreamingSpec) —
  * the reference's semantics are a streaming filter pipeline (README.md:2)
  * and Structured Streaming's incremental execution of the same plan is
  * the Spark-native equivalent of its Lambda micro-batches.
  *
  * State scale: windowed aggs and dedup keep per-key state in the
  * StateStore keyed by (group key, window); watermarks (B1/B6) bound state
  * size, which is what makes these runnable indefinitely at 100 TB/day.
  */
object StreamOps {

  /** B1: event-time watermark. */
  def withLateness(df: DataFrame, tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)

  /** B2: tumbling-window counts+sums per event type. */
  def tumblingCounts(df: DataFrame, tsCol: Column, width: String): DataFrame =
    df.groupBy(window(tsCol, width), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("val_sum"))
      .select(col("window.start").as("window_start"), col("event_type"), col("cnt"), col("val_sum"))

  /** B3: sliding-window counts. */
  def slidingCounts(df: DataFrame, tsCol: Column, width: String, slide: String): DataFrame =
    df.groupBy(window(tsCol, width, slide))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("cnt"))

  /** B4: session windows per key (gap-based). */
  def sessionCounts(df: DataFrame, tsCol: Column, keyCol: Column, gap: String): DataFrame =
    df.groupBy(session_window(tsCol, gap), keyCol)
      .agg(count(lit(1)).as("cnt"))
      .select(
        keyCol,
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("cnt")
      )

  /** Pipeline-health monitor: per (event-time window, shard) operational
    * stats — volume, malformed-payload count, freshest event time — as ONE
    * windowed aggregation whose identical plan runs in batch (oracle twin
    * `b11_stream_health`) and streaming (watermark + append, StreamingSpec).
    * This is the operational dashboard every ingest pipeline runs next to
    * the data path: a shard whose `cnt` drops or whose `max_ts` stalls is
    * lagging; a `malformed_cnt` spike is an upstream schema break.
    *
    * Malformed detection is the A8 contract: PERMISSIVE `from_json` with a
    * corrupt-record column, so "malformed" means exactly what the ingest
    * path would null-out. Scale: partial aggregation combines per shard ×
    * window before the shuffle, so the output is bounded by
    * (shards × windows), not event volume; the watermark bounds streaming
    * state the same way.
    */
  def streamHealth(
      df: DataFrame,
      tsCol: Column,
      shardCol: Column,
      rawCol: Column,
      width: String): DataFrame =
    df.withColumn("shard", shardCol)
      .withColumn(
        "parsed_health",
        from_json(
          rawCol,
          StructType(Seq(StructField("k", LongType), StructField("_corrupt", StringType))),
          Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")
        )
      )
      .groupBy(window(tsCol, width), col("shard"))
      .agg(
        count(lit(1)).as("cnt"),
        count(when(col("parsed_health._corrupt").isNotNull, 1)).as("malformed_cnt"),
        max(tsCol).as("max_ts")
      )
      .select(
        col("window.start").as("window_start"),
        col("shard"),
        col("cnt"),
        col("malformed_cnt"),
        col("max_ts")
      )

  /** B5: streaming dedup — at-least-once Kinesis delivery → exactly-once
    * downstream. In streaming mode with a watermark this uses
    * dropDuplicatesWithinWatermark so state expires. */
  def dedupByKey(df: DataFrame, keys: Seq[String]): DataFrame =
    if (df.isStreaming) df.dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
    else df.dropDuplicates(keys)

  /** B8: stream-static enrichment join (dimension broadcast). */
  def enrich(stream: DataFrame, dim: DataFrame, cond: Column): DataFrame =
    stream.join(broadcast(dim), cond)

  /** Stream-stream interval join: both sides watermarked, right events
    * matched within [left.ts, left.ts + window]. The time-range condition
    * is what lets Spark expire join state — without it the state grows
    * unboundedly, which is the difference between a demo and a 100 TB/day
    * deployment. Columns must be pre-disambiguated by the caller. */
  def streamStreamIntervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      lateness: String,
      window: String,
      keyCond: Column
  ): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    l.join(
      r,
      keyCond &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $window")
    )
  }

  /** Stream-stream LEFT OUTER interval join: like
    * [[streamStreamIntervalJoin]], but a left event with no right match
    * inside its interval is EMITTED with nulls once the watermark passes
    * the end of its match window (the engine can only then prove no match
    * can still arrive) — the "orders that never got a payment" shape.
    * Same state-expiry argument: the time-range condition plus both
    * watermarks bound the join state AND give the null-emit its
    * completeness proof; an outer stream-stream join without them is
    * rejected by Spark outright. */
  def streamStreamIntervalJoinLeftOuter(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      lateness: String,
      window: String,
      keyCond: Column
  ): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    l.join(
      r,
      keyCond &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $window"),
      "left_outer"
    )
  }

  /** Stream-stream FULL OUTER interval join: matched pairs flow through
    * like the inner form; a LEFT row with no right match in its interval
    * emits null-extended once the watermark closes its window (as in
    * [[streamStreamIntervalJoinLeftOuter]]), and a RIGHT row that
    * completed no live left interval emits null-extended once the
    * watermark proves no left row can still open one — the
    * reconciliation shape ("orders without payments AND payments without
    * orders" in one pass). Same watermark + time-range state contract;
    * Spark supports full_outer stream-stream joins under exactly these
    * bounds. */
  def streamStreamIntervalJoinFullOuter(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      lateness: String,
      window: String,
      keyCond: Column
  ): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    l.join(
      r,
      keyCond &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $window"),
      "full_outer"
    )
  }

  /** Stream-stream LEFT SEMI interval join: emit each left event AT MOST
    * ONCE iff some right event lands in [left.ts, left.ts + window] —
    * the "did this click convert" existence test, without duplicating the
    * left row per match the way the inner join does (a click with 40
    * matching purchases is still one converted click). Spark supports
    * semi stream-stream joins with the same watermark + time-range state
    * contract as inner: left rows buffer only until the watermark passes
    * the end of their match window, right rows until they can no longer
    * complete any live left interval — state stays bounded at any stream
    * length. Output columns are the LEFT side's only (semi-join shape). */
  def streamStreamIntervalSemiJoin(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      lateness: String,
      window: String,
      keyCond: Column
  ): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    l.join(
      r,
      keyCond &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $window"),
      "left_semi"
    )
  }

  // --- B7: arbitrary stateful processing -------------------------------

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, lastSeen: Long, count: Long, valueSum: Double)
  final case class SessionOut(user_id: Long, start: Timestamp, end: Timestamp, count: Long, valueSum: Double)

  final case class UserTotals(user_id: Long, events: Long, valueSum: Double)

  /** B7 via the Spark 4 `transformWithState` API: a per-key running
    * counter/sum with explicit `ValueState` — the modern replacement for
    * flatMapGroupsWithState, with typed state handles, TTL support, and a
    * RocksDB-backed store (set
    * `spark.sql.streaming.stateStore.providerClass` to the RocksDB
    * provider; transformWithState requires it). Emits updated totals for
    * every key touched in a micro-batch. */
  class RunningTotalsProcessor extends StatefulProcessor[Long, SessionEvent, UserTotals] {
    @transient private var state: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)](
        "totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        TTLConfig.NONE
      )

    override def handleInputRows(
        key: Long,
        rows: Iterator[SessionEvent],
        timerValues: TimerValues
    ): Iterator[UserTotals] = {
      var (n, sum) = if (state.exists()) state.get() else (0L, 0.0)
      rows.foreach { e => n += 1; sum += e.value }
      state.update((n, sum))
      Iterator(UserTotals(key, n, sum))
    }
  }

  /** Apply [[RunningTotalsProcessor]] to a stream of [[SessionEvent]]. */
  def runningTotals(events: Dataset[SessionEvent]): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor, TimeMode.None(), OutputMode.Update())
  }

  final case class TypedEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class SeqMatch(user_id: Long, start: Timestamp, end: Timestamp)
  final case class SeqProgress(stage: Int, startMs: Long)

  /** B7 (CEP flavor): detect an event-type sequence per key — e.g.
    * click ⤳ view ⤳ purchase within 30 minutes — with "followed-by"
    * semantics (intervening events allowed). Keyed progress state advances
    * per matching stage; a match emits and resets; stages older than
    * `withinMs` expire, and idle keys are GC'd by event-time timeout —
    * state stays O(active keys) at any stream size, the difference between
    * CEP-on-a-box and CEP at 100 TB/day. */
  def detectSequence(
      events: Dataset[TypedEvent],
      pattern: Seq[String],
      withinMs: Long
  ): Dataset[SeqMatch] = {
    require(pattern.nonEmpty)
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user: Long, rows: Iterator[TypedEvent], state: GroupState[SeqProgress]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted  = rows.toSeq.sortBy(_.ts.getTime)
            var current = state.getOption
            var matches = List.empty[SeqMatch]
            sorted.foreach { e =>
              val t = e.ts.getTime
              // expire a stale partial match
              current = current.filter(p => t - p.startMs <= withinMs)
              val stage = current.map(_.stage).getOrElse(0)
              if (e.event_type == pattern(stage)) {
                if (stage == pattern.length - 1 && (current.nonEmpty || pattern.length == 1)) {
                  val startMs = current.map(_.startMs).getOrElse(t)
                  matches = SeqMatch(user, new Timestamp(startMs), e.ts) :: matches
                  current = None
                } else if (stage == 0) {
                  current = Some(SeqProgress(1, t))
                } else {
                  current = current.map(p => p.copy(stage = p.stage + 1))
                }
              }
            }
            current match {
              case Some(p) =>
                state.update(p)
                state.setTimeoutTimestamp(p.startMs + withinMs)
              case None =>
                if (state.exists) state.remove()
            }
            matches.reverseIterator
          }
        }
      )
  }

  /** Custom per-key sessionizer over flatMapGroupsWithState: emits a
    * session row when the gap timeout fires. Demonstrates arbitrary keyed
    * state (counters, CEP-ish accumulation) beyond built-in windows. */
  def sessionize(
      events: Dataset[SessionEvent],
      gapMs: Long
  ): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(
              SessionOut(user, new Timestamp(s.start), new Timestamp(s.lastSeen + gapMs), s.count, s.valueSum)
            )
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed  = List.empty[SessionOut]
            var current = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              current match {
                case Some(s) if t - s.lastSeen < gapMs =>
                  current = Some(s.copy(lastSeen = math.max(s.lastSeen, t), count = s.count + 1, valueSum = s.valueSum + e.value))
                case Some(s) =>
                  closed = SessionOut(user, new Timestamp(s.start), new Timestamp(s.lastSeen + gapMs), s.count, s.valueSum) :: closed
                  current = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  current = Some(SessionState(t, t, 1L, e.value))
              }
            }
            current.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMs)
            }
            closed.reverseIterator
          }
        }
      )
  }
}
