package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided testdata tables (TESTDATA.md).
  *
  * Every query in [[graft.SparkEntry]] receives `(spark, sfDir)` and reads
  * through here so the read path (format, options) is centralized. At 100 TB
  * these would be partitioned/bucketed table roots rather than single files;
  * the loader is the one place that would change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Some testdata generations store events.ts as TIMESTAMP(NANOS), which
    // Spark's parquet reader rejects; with nanosAsLong=true those arrive as
    // raw LongType nanos and we downcast to micros (matches DuckDB's
    // CAST(ts AS TIMESTAMP) truncation). Newer generations store
    // TIMESTAMP_MICROS, which arrives as TIMESTAMP_NTZ and takes the
    // normalization below instead — branch on the schema actually read so
    // both generations load.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    val fixed =
      if (df.schema.fields.exists(f =>
            f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType))
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      else df
    // The testdata parquet stores TIMESTAMP_NTZ; normalize to TIMESTAMP
    // (session TZ is UTC, so the cast is value-preserving) so downstream
    // code sees one timestamp type everywhere.
    fixed.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType => f.name
    }.foldLeft(fixed)((d, c) => d.withColumn(c, d(c).cast("timestamp")))
  }
}
