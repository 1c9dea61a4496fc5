package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

class TripStateMachineSpec extends SparkSpec {
  import TripStateMachine._
  import spark.implicits._

  private def ev(id: Long, st: String, t: String) =
    StatusEvent(id, st, Timestamp.valueOf(t))

  test("transition table") {
    assert(allowed("requested", "accepted"))
    assert(allowed("started", "completed"))
    assert(allowed("accepted", "canceled"))
    assert(!allowed("requested", "started")) // skipping a step
    assert(!allowed("completed", "canceled")) // terminal
    assert(!allowed("canceled", "accepted"))
  }

  test("streaming state machine applies legal transitions, rejects others") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StatusEvent]
    val q = TripStateMachine(in.toDS())
      .writeStream.format("memory").queryName("trips_sm")
      .outputMode("update").start()
    try {
      in.addData(
        ev(1, "requested", "2024-01-01 10:00:00"),
        ev(1, "accepted", "2024-01-01 10:01:00"),
        ev(2, "accepted", "2024-01-01 10:00:00")) // must start at requested
      q.processAllAvailable()
      val s1 = spark.table("trips_sm").as[TripState].collect()
        .map(s => s.trip_id -> s).toMap
      assert(s1(1L).status == "accepted" && s1(1L).transitions == 2)
      assert(s1(2L).status == "none" && s1(2L).rejected == 1)

      // out-of-order timestamp rejected; terminal clears the state
      in.addData(
        ev(1, "started", "2024-01-01 09:00:00"), // before 'accepted' -> reject
        ev(1, "started", "2024-01-01 10:05:00"),
        ev(1, "completed", "2024-01-01 10:20:00"))
      q.processAllAvailable()
      val s2 = spark.table("trips_sm").as[TripState].collect()
        .filter(_.trip_id == 1L).maxBy(_.transitions)
      assert(s2.status == "completed" && s2.transitions == 4 && s2.rejected == 1)

      // after terminal, a fresh 'requested' starts over (state was removed)
      in.addData(ev(1, "requested", "2024-01-02 08:00:00"))
      q.processAllAvailable()
      val s3 = spark.table("trips_sm").as[TripState].collect()
        .filter(_.trip_id == 1L).maxBy(s => s.since.getTime)
      assert(s3.status == "requested" && s3.transitions == 1)
    } finally q.stop()
  }
}
