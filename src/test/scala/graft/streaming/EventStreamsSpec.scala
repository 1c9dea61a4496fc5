package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {
  import EventStreams._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(id: Long, t: String, user: Long = 1L, typ: String = "click",
                 v: Double = 1.0) = Event(id, ts(t), user, typ, v)

  test("windowedCounts finalizes a window once the watermark passes it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = windowedCounts(in.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(1, "2024-01-01 10:05:00"), ev(2, "2024-01-01 10:40:00", v = 2.0))
      q.processAllAvailable()
      // watermark still inside the 10:00 window → nothing appended yet
      assert(spark.table("wc").count() == 0)
      // event far ahead pushes the watermark past 11:00
      in.addData(ev(3, "2024-01-01 13:00:00"))
      q.processAllAvailable()
      val rows = spark.table("wc")
        .select("window_start", "n_events", "sum_value")
        .as[(Timestamp, Long, Double)].collect().toSet
      assert(rows == Set((ts("2024-01-01 10:00:00"), 2L, 3.0)))
    } finally q.stop()
  }

  test("enrich decorates the stream with a broadcast dim; unmatched keys keep NULLs") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("uid", "tier")
    val q = enrich(in.toDF(), dim, "user_id", "uid")
      .select("event_id", "tier")
      .writeStream.format("memory").queryName("enr")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(1, "2024-01-01 10:00:00", user = 1),
        ev(2, "2024-01-01 10:01:00", user = 2),
        ev(3, "2024-01-01 10:02:00", user = 77)) // no dim row
      q.processAllAvailable()
      val rows = spark.table("enr").as[(Long, Option[String])].collect().toSet
      assert(rows == Set((1L, Some("gold")), (2L, Some("silver")), (3L, None)))
    } finally q.stop()
  }

  test("dedupe drops repeated event ids within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = dedupe(in.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dd")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:00:00"),
        ev(2, "2024-01-01 10:01:00"))
      q.processAllAvailable()
      assert(spark.table("dd").count() == 2)
    } finally q.stop()
  }

  test("sessionize emits a session when the gap timeout fires") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = sessionize(in.toDS(), gapSeconds = 1800, lateness = "1 minute")
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(1, "2024-01-01 10:00:00", v = 1.5),
        ev(2, "2024-01-01 10:10:00", v = 2.5))
      q.processAllAvailable()
      assert(spark.table("sess").count() == 0) // session still open
      // far-future event: watermark passes 10:10 + 30min gap → timeout
      in.addData(ev(9, "2024-01-01 12:00:00", user = 2L))
      q.processAllAvailable()
      val s = spark.table("sess").as[Session].collect()
      assert(s.length == 1)
      assert(s.head == Session(1L, ts("2024-01-01 10:00:00"),
        ts("2024-01-01 10:10:00"), 2L, 4.0))
    } finally q.stop()
  }

  test("attribution joins views to purchases within the interval, per user") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = attribution(in.toDF(), "view", "purchase",
      withinSeconds = 1800, lateness = "1 minute")
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        ev(1, "2024-01-01 10:00:00", user = 1L, typ = "view"),
        ev(2, "2024-01-01 10:10:00", user = 1L, typ = "purchase", v = 9.99),
        // outside the 30-min interval -> not attributed
        ev(3, "2024-01-01 11:30:00", user = 1L, typ = "purchase", v = 5.0),
        // other user's purchase -> not attributed
        ev(4, "2024-01-01 10:05:00", user = 2L, typ = "purchase", v = 1.0))
      q.processAllAvailable()
      // push both watermarks far enough to emit the joined row
      in.addData(ev(8, "2024-01-01 13:00:00", user = 9L, typ = "view"),
        ev(9, "2024-01-01 13:00:00", user = 9L, typ = "purchase"))
      q.processAllAvailable()
      val rows = spark.table("attr")
        .select("user_id", "left_id", "right_id", "right_value")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(rows.contains((1L, 1L, 2L, 9.99)))
      assert(!rows.exists(r => r._3 == 3L || r._3 == 4L))
    } finally q.stop()
  }

  test("sessionize splits events separated by more than the gap in one batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = sessionize(in.toDS(), gapSeconds = 1800, lateness = "1 minute")
      .writeStream.format("memory").queryName("sess2")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 11:30:00"))
      q.processAllAvailable()
      // first session closed inline (gap exceeded within the batch)
      val s = spark.table("sess2").as[Session].collect()
      assert(s.length == 1 && s.head.session_start == ts("2024-01-01 10:00:00"))
    } finally q.stop()
  }
}
