package graft.core

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Testdata-drift canary: the driver has regenerated `/root/testdata`
  * mid-round and flipped events.ts between TIMESTAMP(NANOS) (reads as raw
  * LongType under `nanosAsLong=true`) and TIMESTAMP_MICROS (reads as
  * TIMESTAMP_NTZ). `Tables.load` must produce a session-TZ TIMESTAMP with
  * identical values for BOTH generations — the r7 blackout (19 dark
  * queries) was exactly this branch missing.
  */
class TablesDriftSpec extends SparkSpec {
  import spark.implicits._

  // 2024-03-01 12:34:56.789012 UTC, micros precision.
  private val micros = 1709296496789012L

  private def loadFixture(writeTs: org.apache.spark.sql.DataFrame): StructType = {
    val dir = Files.createTempDirectory("graft-drift").toString
    writeTs.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.load(spark, dir, "events")
    val ts = got.select(unix_micros($"ts")).as[Long].head()
    assert(got.schema("ts").dataType === TimestampType,
      s"ts must normalize to TIMESTAMP, got ${got.schema("ts").dataType}")
    assert(ts === micros, s"ts value drifted: $ts != $micros")
    got.schema
  }

  test("micros generation (TIMESTAMP_NTZ read) loads as TIMESTAMP") {
    // Spark writes TimestampNTZType as TIMESTAMP_MICROS(isAdjustedToUTC=false),
    // which is exactly what the regenerated testdata stores.
    val df = Seq(1L).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(micros)).cast(TimestampNTZType))
    loadFixture(df)
  }

  test("nanos generation (LongType read) loads as TIMESTAMP via div-1000") {
    // Under nanosAsLong=true a TIMESTAMP(NANOS) column arrives as raw long
    // nanos — indistinguishable from a plain INT64 at read time, so a long
    // column exercises the identical loader branch.
    val df = Seq((1L, micros * 1000L)).toDF("event_id", "ts")
    loadFixture(df)
  }

  test("tables without a ts column are untouched by the rewrite") {
    val dir = Files.createTempDirectory("graft-drift").toString
    Seq((1L, "a")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val got = Tables.load(spark, dir, "region")
    assert(got.schema.fieldNames.toSeq === Seq("r_regionkey", "r_name"))
    assert(got.count() === 1L)
  }
}
