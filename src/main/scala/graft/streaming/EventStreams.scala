package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

import java.sql.Timestamp

/** Structured Streaming over the events shape (event_id, ts, user_id,
  * event_type, value) — the streaming twin of the batch operators:
  *
  *  - [[windowedCounts]]: event-time tumbling windows + watermark (the
  *    streaming form of the q10/q20 time-bucketed aggregates)
  *  - [[dedupe]]: watermarked exact dedup on event_id (streaming W1/A5)
  *  - [[sessionize]]: gap-based sessions via flatMapGroupsWithState with
  *    event-time timeout (the streaming twin of batch q27_sessionize)
  *
  * Scale: all three are keyed-state operators — state is partitioned by
  * grouping key across executors, and the watermark bounds state size (a
  * session/window/dedup entry is dropped once the watermark passes it).
  * Without the watermark every one of these would grow state unboundedly
  * at 100 TB/day; with it, state is O(active keys within the lateness
  * horizon).
  */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Internal per-user session accumulator (public: the state encoder's
    * generated code must be able to reach the accessors). */
  case class SessionState(startMs: Long, endMs: Long, cnt: Long, total: Double)

  /** Tumbling event-time window counts per event_type; late data beyond
    * `lateness` is dropped by the watermark. Append-mode capable: a window
    * finalizes once the watermark passes its end. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(38, 6))).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Exactly-once event dedup within the watermark horizon: duplicates are
    * dropped on `event_id` alone, so a redelivery with a perturbed
    * timestamp still dedups (the (id, ts)-exact form would not). */
  def dedupe(events: DataFrame, lateness: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream–static enrichment: decorate the event stream with a
    * dimension table (broadcast per micro-batch — the static side is
    * re-resolved each batch, so a dim refreshed in place is picked up
    * without restarting the query). Unmatched keys keep the stream row
    * with NULL dim columns, the J1-style late-dim contract. Stateless:
    * nothing accumulates, any watermark is the downstream consumer's
    * concern. */
  def enrich(events: DataFrame, dim: DataFrame, streamKey: String,
             dimKey: String): DataFrame =
    events.join(broadcast(dim.withColumnRenamed(dimKey, streamKey)),
      Seq(streamKey), "left")

  /** Stream-stream interval join: per user, each event of `leftType` is
    * attributed to following `rightType` events within `withinSeconds` of
    * event time (view→purchase attribution). Both sides are watermarked
    * and the join condition is time-BOUNDED in both directions, so Spark
    * can expire join state — without the bound, stream-stream join state
    * grows forever at 100 TB/day. */
  def attribution(events: DataFrame, leftType: String, rightType: String,
                  withinSeconds: Long = 1800,
                  lateness: String = "30 minutes"): DataFrame = {
    val l = events.filter(col("event_type") === leftType)
      .select(col("event_id").as("left_id"), col("user_id").as("left_user"),
        col("ts").as("left_ts"))
      .withWatermark("left_ts", lateness)
    val r = events.filter(col("event_type") === rightType)
      .select(col("event_id").as("right_id"), col("user_id").as("right_user"),
        col("ts").as("right_ts"), col("value").as("right_value"))
      .withWatermark("right_ts", lateness)
    l.join(r,
      col("left_user") === col("right_user") &&
        col("right_ts") >= col("left_ts") &&
        col("right_ts") <= col("left_ts") + expr(s"interval $withinSeconds seconds"))
      .select(col("left_user").as("user_id"), col("left_id"), col("right_id"),
        col("left_ts"), col("right_ts"), col("right_value"))
  }

  /** Gap-based sessionization: a session closes when no event arrives for
    * `gapSeconds` of event time. Sessions are emitted on timeout, i.e.
    * when the watermark passes last-event-time + gap. */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800,
                 lateness: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    def update(userId: Long, batch: Iterator[Event],
               state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(Session(userId, new Timestamp(s.startMs),
          new Timestamp(s.endMs), s.cnt, s.total))
      } else {
        val evs = batch.toSeq.sortBy(_.ts.getTime)
        var closed = List.empty[Session]
        var cur = state.getOption
        evs.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.endMs > gapMs =>
              closed ::= Session(userId, new Timestamp(s.startMs),
                new Timestamp(s.endMs), s.cnt, s.total)
              cur = Some(SessionState(t, t, 1, e.value))
            case Some(s) =>
              cur = Some(SessionState(s.startMs, math.max(s.endMs, t),
                s.cnt + 1, s.total + e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.endMs + gapMs)
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
