package graft.tx

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.nio.file.Files

/** The driver-side control-plane write must be indistinguishable from a
  * coalesce(1) Spark write to every reader — same rows, same schema,
  * same logical types (timestamps included: the watermark table is the
  * main customer). */
class LocalParquetSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("job_name", StringType, nullable = false),
    StructField("last_loaded_ts", TimestampType, nullable = true),
    StructField("n", LongType, nullable = false),
    StructField("share", DoubleType, nullable = false)))

  private val rows = Seq(
    Row("alpha", java.sql.Timestamp.valueOf("2024-01-02 03:04:05"), 7L, 0.25),
    Row("beta", null, -1L, 1.0))

  test("driver-written parquet reads back identical to a Spark write") {
    val dir = Files.createTempDirectory("graft-localpq").toString
    LocalParquet.write(spark,
      new org.apache.hadoop.fs.Path(s"$dir/local/part-00000.parquet"),
      rows, schema)
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .coalesce(1).write.parquet(s"$dir/spark")
    val local = spark.read.parquet(s"$dir/local")
    val viaSpark = spark.read.parquet(s"$dir/spark")
    assert(local.schema == viaSpark.schema,
      s"schema drift: ${local.schema} vs ${viaSpark.schema}")
    assert(local.collect().toSet == viaSpark.collect().toSet)
  }

  test("empty row set yields a schema-bearing empty file (bootstrap shape)") {
    val dir = Files.createTempDirectory("graft-localpq-empty").toString
    LocalParquet.write(spark,
      new org.apache.hadoop.fs.Path(s"$dir/t/part-00000.parquet"),
      Nil, schema)
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 0L)
    assert(back.columns.toSeq ==
      Seq("job_name", "last_loaded_ts", "n", "share"))
  }

  test("writeLocalRows commits through the normal promote/vacuum cycle " +
      "and refuses partition-committed tables") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-localpq-tx").toString + "/t"
    AtomicRewrite.writeLocalRows(spark, root, rows.take(1), schema)
    assert(AtomicRewrite.currentVersion(spark, root).contains(0L))
    AtomicRewrite.writeLocalRows(spark, root, rows, schema)
    assert(AtomicRewrite.currentVersion(spark, root).contains(1L))
    assert(AtomicRewrite.read(spark, root).count() == 2L)
    val part = Files.createTempDirectory("graft-localpq-p").toString + "/p"
    AtomicRewrite.writePartitions(spark, part,
      Seq((1L, 0), (2L, 1)).toDF("k", "b"), Seq("b"))
    intercept[IllegalArgumentException] {
      AtomicRewrite.writeLocalRows(spark, part, rows, schema)
    }
  }
}
