package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def batch(rows: (Long, String, String)*): DataFrame =
    Scd2.prepare(
      rows.toSeq.toDF("id", "status", "t")
        .withColumn("t", to_timestamp(col("t"))),
      businessCols = Seq("status"), tsCol = "t")

  private def emptyHistory = batch().limit(0)

  test("first batch: all rows current; one current row per key") {
    val h = Scd2.apply(emptyHistory, batch((1L, "new", "2024-01-01 00:00:00")),
      Seq("id"), Seq("t"))
    assert(h.count() == 1)
    assert(h.filter(col("is_current")).count() == 1)
  }

  test("changed hash closes old version and inserts new; unchanged is no-op") {
    val h0 = Scd2.apply(emptyHistory,
      batch((1L, "new", "2024-01-01 00:00:00"), (2L, "new", "2024-01-01 00:00:00")),
      Seq("id"), Seq("t"))
    val h1 = Scd2.apply(h0,
      batch((1L, "done", "2024-01-02 00:00:00"), (2L, "new", "2024-01-02 00:00:00")),
      Seq("id"), Seq("t"))
    // key 1: closed old + new current; key 2: untouched
    assert(h1.count() == 3)
    val cur = h1.filter(col("is_current")).select("id", "status")
      .as[(Long, String)].collect().toSet
    assert(cur == Set((1L, "done"), (2L, "new")))
    val closed = h1.filter(!col("is_current")).select("id", "valid_to")
      .as[(Long, Timestamp)].head()
    assert(closed == ((1L, ts("2024-01-02 00:00:00"))))
    // SCD2 invariant: exactly one current row per key
    val perKey = h1.filter(col("is_current")).groupBy("id").count()
      .select("count").as[Long].collect()
    assert(perKey.forall(_ == 1))
  }

  test("replaying the same batch is idempotent (hash short-circuit)") {
    val b = batch((1L, "new", "2024-01-01 00:00:00"))
    val h1 = Scd2.apply(emptyHistory, b, Seq("id"), Seq("t"))
    val h2 = Scd2.apply(h1, b, Seq("id"), Seq("t"))
    assert(h2.count() == 1)
    assert(h2.filter(col("is_current")).count() == 1)
  }

  test("intra-batch versions dedup to latest before merging") {
    val b = batch((1L, "v1", "2024-01-01 00:00:00"), (1L, "v2", "2024-01-03 00:00:00"))
    val h = Scd2.apply(emptyHistory, b, Seq("id"), Seq("t"))
    assert(h.filter(col("is_current")).select("status").as[String].head() == "v2")
  }

  test("fromChangeLog collapses consecutive same-hash rows") {
    val log = Seq(
      (1L, 1L, "a", "2024-01-01 00:00:00"),
      (1L, 2L, "a", "2024-01-02 00:00:00"), // no change → collapsed
      (1L, 3L, "b", "2024-01-03 00:00:00"))
      .toDF("user_id", "event_id", "event_type", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    val h = Scd2.fromChangeLog(log, Seq("user_id"), Seq("event_type"), "ts", Seq("event_id"))
    val rows = h.select("event_type", "valid_to", "is_current")
      .as[(String, Option[Timestamp], Boolean)].collect().toSet
    assert(rows == Set(
      ("a", Some(ts("2024-01-03 00:00:00")), false),
      ("b", None, true)))
  }
}
