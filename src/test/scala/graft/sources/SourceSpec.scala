package graft.sources

import graft.SparkSpec
import graft.pipeline.Medallion
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

class SourceSpec extends SparkSpec {
  import spark.implicits._

  test("ParquetSource.readIncremental filters on the watermark") {
    val dir = Files.createTempDirectory("graft-src").toString
    Seq((1L, "2024-01-01 00:00:00"), (2L, "2024-01-02 00:00:00"))
      .toDF("id", "updated_at")
      .withColumn("updated_at", to_timestamp(col("updated_at")))
      .write.parquet(s"$dir/t")
    val src = ParquetSource(s"$dir/t")
    assert(src.read(spark).count() == 2)
    val inc = src.readIncremental(spark, "updated_at",
      Some(Timestamp.valueOf("2024-01-01 12:00:00")))
    assert(inc.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("bronzeLoad extracts through a Source with watermark pushdown") {
    val dir = Files.createTempDirectory("graft-src2").toString
    Seq((1L, "a", "2024-01-01 00:00:00"), (2L, "b", "2024-01-02 00:00:00"))
      .toDF("id", "v", "updated_at")
      .withColumn("updated_at", to_timestamp(col("updated_at")))
      .write.parquet(s"$dir/src")
    val paths = Medallion.Paths(s"$dir/lake")
    val n1 = Medallion.bronzeLoad(spark, paths, "t", ParquetSource(s"$dir/src"),
      "updated_at", "b1", Timestamp.valueOf("2024-01-03 00:00:00"))
    assert(n1 == 2L)
    // re-extract: watermark at max(updated_at) → nothing new
    val n2 = Medallion.bronzeLoad(spark, paths, "t", ParquetSource(s"$dir/src"),
      "updated_at", "b2", Timestamp.valueOf("2024-01-04 00:00:00"))
    assert(n2 == 0L)
  }

  test("FileSource reads CSV and JSONL drops with an explicit schema") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-src3").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("updated_at", TimestampType)))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/drop.csv"),
      "1,a,2024-01-01 00:00:00\n2,b,2024-01-02 00:00:00\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/drop.jsonl"),
      """{"id":3,"v":"c","updated_at":"2024-01-03 00:00:00"}""" + "\n")

    val csv = FileSource(s"$dir/drop.csv", "csv", schema)
    assert(csv.read(spark).count() == 2)
    assert(csv.readIncremental(spark, "updated_at",
      Some(Timestamp.valueOf("2024-01-01 12:00:00")))
      .select("id").as[Long].collect().toSeq == Seq(2L))

    val json = FileSource(s"$dir/drop.jsonl", "json", schema)
    assert(json.read(spark).select("id").as[Long].collect().toSeq == Seq(3L))

    // bronze ingests through it like any Source
    val paths = Medallion.Paths(s"$dir/lake")
    assert(Medallion.bronzeLoad(spark, paths, "t", csv, "updated_at", "b1",
      Timestamp.valueOf("2024-01-05 00:00:00")) == 2L)

    intercept[IllegalArgumentException] {
      FileSource(s"$dir/x", "xml", schema)
    }
  }

  test("JdbcSource builds the pushdown dbtable") {
    val s = JdbcSource("jdbc:postgresql://db/x", "mobility.trips",
      pushdown = Some("SELECT * FROM mobility.trips WHERE status = 'done'"))
    // no database in this environment — contract only: reader must embed
    // the subquery; actual load would hit the URL
    assert(s.pushdown.get.contains("status"))
  }
}
