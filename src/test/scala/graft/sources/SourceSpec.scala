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
    assert(s.pushdown.get.contains("status"))
  }

  test("JdbcSource live over embedded Derby: read, watermark pushdown, GDPR subquery") {
    // Derby ships in the Spark distribution (hive metastore dependency) —
    // an in-memory database gives the live-JDBC path a real integration
    // test without network egress
    // keep Derby's boot log out of the working tree
    System.setProperty("derby.stream.error.file",
      s"${System.getProperty("java.io.tmpdir")}/derby.log")
    val url = "jdbc:derby:memory:graftsrc;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE trips (id BIGINT, status VARCHAR(10), updated_at TIMESTAMP)")
      st.execute("INSERT INTO trips VALUES (1, 'done', TIMESTAMP('2024-01-01 00:00:00'))")
      st.execute("INSERT INTO trips VALUES (2, 'open', TIMESTAMP('2024-01-02 00:00:00'))")
      st.execute("INSERT INTO trips VALUES (3, 'done', TIMESTAMP('2024-01-03 00:00:00'))")
      st.close()
    } finally conn.close()

    val src = JdbcSource(url, "trips")
    assert(src.read(spark).count() == 3)

    // S1: the watermark filter must reach the DATABASE as a WHERE clause
    // (JDBC PushedFilters), not scan-then-filter in Spark
    val inc = src.readIncremental(spark, "UPDATED_AT",
      Some(Timestamp.valueOf("2024-01-01 12:00:00")))
    assert(inc.select("ID").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    val plan = inc.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(UPDATED_AT"),
      s"watermark filter must push into the JDBC scan:\n$plan")

    // S2: the server-side subquery idiom (GDPR's derived-id extraction,
    // reference gdpr_propagate_erasure.py:301-326)
    val sub = JdbcSource(url, "trips",
      pushdown = Some("SELECT id, updated_at FROM trips WHERE status = 'done'"))
    assert(sub.read(spark).select("ID").as[Long].collect().sorted.toSeq == Seq(1L, 3L))

    // and bronze extracts through it like any Source
    val paths = Medallion.Paths(
      Files.createTempDirectory("graft-jdbc-lake").toString)
    assert(Medallion.bronzeLoad(spark, paths, "trips", src, "UPDATED_AT", "b1",
      Timestamp.valueOf("2024-02-01 00:00:00")) == 3L)
    // second extraction: watermark holds, nothing new upstream
    assert(Medallion.bronzeLoad(spark, paths, "trips", src, "UPDATED_AT", "b2",
      Timestamp.valueOf("2024-02-02 00:00:00")) == 0L)
  }
}
