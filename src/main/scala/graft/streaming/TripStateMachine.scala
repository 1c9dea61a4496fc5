package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming trip-lifecycle state machine over status-change events
  * (the reference's trip status updates as a continuous feed):
  * requested → accepted → started → completed, any non-terminal →
  * canceled. Illegal or out-of-order transitions are flagged, not applied —
  * the streaming twin of the batch DQ flags (accepted_before_requested
  * etc.), enforced at ingestion time instead of detected after the fact.
  *
  * Uses mapGroupsWithState (exactly one output row per updated key per
  * batch): keyed state is one small record per in-flight trip, dropped on
  * terminal states via timeout-free explicit cleanup.
  */
object TripStateMachine extends Serializable {

  case class StatusEvent(trip_id: Long, status: String, at: Timestamp)

  case class TripState(trip_id: Long, status: String, since: Timestamp,
                       transitions: Int, rejected: Int)

  private val Order = Map("requested" -> 0, "accepted" -> 1, "started" -> 2,
    "completed" -> 3)
  private val Terminal = Set("completed", "canceled")

  def allowed(from: String, to: String): Boolean =
    if (Terminal(from)) false
    else if (to == "canceled") true
    else (Order.get(from), Order.get(to)) match {
      case (Some(a), Some(b)) => b == a + 1
      case _ => false
    }

  def apply(events: Dataset[StatusEvent]): Dataset[TripState] = {
    import events.sparkSession.implicits._

    def update(id: Long, batch: Iterator[StatusEvent],
               state: GroupState[TripState]): TripState = {
      var cur = state.getOption.getOrElse(TripState(id, "none", null, 0, 0))
      batch.toSeq.sortBy(_.at.getTime).foreach { e =>
        val ok =
          if (cur.status == "none") e.status == "requested"
          else allowed(cur.status, e.status) && !e.at.before(cur.since)
        cur =
          if (ok) cur.copy(status = e.status, since = e.at,
            transitions = cur.transitions + 1)
          else cur.copy(rejected = cur.rejected + 1)
      }
      if (Terminal(cur.status)) state.remove() else state.update(cur)
      cur
    }

    events.groupByKey(_.trip_id)
      .mapGroupsWithState[TripState, TripState](
        GroupStateTimeout.NoTimeout)(update)
  }
}
