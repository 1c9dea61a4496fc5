package graft.streaming

import graft.SparkSpec
import graft.tx.AtomicRewrite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

class StreamingSilverSpec extends SparkSpec {
  import EventStreams.Event
  import spark.implicits._

  private def ev(id: Long, t: String, user: Long, typ: String) =
    Event(id, Timestamp.valueOf(t), user, typ, 1.0)

  test("micro-batches fold into the SCD2 snapshot table") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-ss").toString + "/t"
    val in = MemoryStream[Event]
    val q = StreamingSilver.scd2Sink(in.toDF(), root,
      keys = Seq("user_id"), businessCols = Seq("event_type"),
      tsCol = "ts", orderCols = Seq("ts", "event_id"))
    try {
      in.addData(ev(1, "2024-01-01 10:00:00", 1L, "browse"),
        ev(2, "2024-01-01 10:01:00", 2L, "browse"))
      q.processAllAvailable()
      assert(AtomicRewrite.read(spark, root).count() == 2)

      // user 1 changes type -> old version closes, new current appears
      in.addData(ev(3, "2024-01-01 11:00:00", 1L, "buy"))
      q.processAllAvailable()
      val hist = AtomicRewrite.read(spark, root)
      assert(hist.count() == 3)
      val cur = hist.filter(col("is_current"))
        .select("user_id", "event_type").as[(Long, String)].collect().toSet
      assert(cur == Set((1L, "buy"), (2L, "browse")))
      val closed = hist.filter(!col("is_current"))
        .select("user_id", "valid_to").as[(Long, Timestamp)].head()
      assert(closed == ((1L, Timestamp.valueOf("2024-01-01 11:00:00"))))

      // replay of the same change is a no-op (hash short-circuit)
      in.addData(ev(3, "2024-01-01 11:00:00", 1L, "buy"))
      q.processAllAvailable()
      assert(AtomicRewrite.read(spark, root).count() == 3)
    } finally q.stop()
  }
}
