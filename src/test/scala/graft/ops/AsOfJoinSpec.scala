package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("leftAsOf picks the latest reference at-or-before each probe") {
    val quotes = Seq(
      (1L, "2024-01-01 10:00:00", 100.0),
      (1L, "2024-01-01 11:00:00", 110.0),
      (2L, "2024-01-01 10:30:00", 200.0))
      .toDF("k", "t", "px").withColumn("t", to_timestamp(col("t")))
    val trades = Seq(
      (1L, "2024-01-01 10:30:00", "a"), // after 10:00 quote
      (1L, "2024-01-01 11:00:00", "b"), // ties 11:00 quote -> inclusive
      (1L, "2024-01-01 09:00:00", "c"), // before any quote -> null
      (2L, "2024-01-01 12:00:00", "d"),
      (3L, "2024-01-01 12:00:00", "e")) // unseen key -> null
      .toDF("k", "t", "id").withColumn("t", to_timestamp(col("t")))

    val out = AsOfJoin.leftAsOf(trades, quotes, "k", "k", "t", "t", Seq("px"))
      .select("id", "asof_px").as[(String, Option[Double])]
      .collect().toMap
    assert(out == Map("a" -> Some(100.0), "b" -> Some(110.0), "c" -> None,
      "d" -> Some(200.0), "e" -> None))
  }
}
