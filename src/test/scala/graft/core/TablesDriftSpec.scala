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

  test("nanos generation (true TIMESTAMP(NANOS) file) loads as TIMESTAMP via div-1000") {
    // Spark cannot WRITE nano-precision parquet, so build the fixture with
    // parquet-mr directly — the loader must see the NANOS annotation in the
    // footer and rewrite, exactly as with the pre-r7 driver testdata.
    import org.apache.parquet.example.data.simple.SimpleGroup
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.MessageTypeParser
    val dir = Files.createTempDirectory("graft-drift").toString
    val schema = MessageTypeParser.parseMessageType(
      "message events { required int64 event_id; required int64 ts (TIMESTAMP(NANOS,false)); }")
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withConf(conf).withType(schema).build()
    val g = new SimpleGroup(schema)
    g.add("event_id", 1L); g.add("ts", micros * 1000L)
    w.write(g); w.close()
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType === TimestampType)
    assert(got.select(unix_micros($"ts")).as[Long].head() === micros)
  }

  test("a genuine long column named ts is NOT rewritten") {
    // The footer-driven detection must never corrupt a real epoch-long
    // column just because it shares the name.
    val dir = Files.createTempDirectory("graft-drift").toString
    Seq((1L, 42L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType === LongType)
    assert(got.select($"ts").as[Long].head() === 42L)
  }

  test("a float64 embeddings regeneration narrows to array<float> at load") {
    val dir = Files.createTempDirectory("graft-drift").toString
    Seq((1L, Seq(0.25d, -1.5d), 3)).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Tables.load(spark, dir, "embeddings")
    assert(got.schema("embedding").dataType === ArrayType(FloatType, containsNull = true))
    assert(got.select($"embedding").as[Seq[Float]].head() === Seq(0.25f, -1.5f))
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
